"""Job-level plans: resumable checkpointed index builds."""
