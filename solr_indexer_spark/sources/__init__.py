"""Source layer: the reference's corpus discovery modes re-expressed as
table reads (SURVEY §2.1 S1-S3, S10)."""
