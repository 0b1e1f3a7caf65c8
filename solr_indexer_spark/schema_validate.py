"""Declarative schema validation with a per-executor compiled-schema
cache — the engine analogue of the reference's lxml XMLSchema path
(solrindexer/mmd.py:238-271 validates each MMD document against an XSD;
mmd.py:51-94 caches the COMPILED schema so each worker parses the XSD
once and reuses it across documents).

Web pages have no XSD, so the schema here is a JSON spec of the same
rule families the reference's XSD enforces:

  required   — fields that must be present and non-empty   (fatal)
  types      — castability constraints                      (fatal)
  vocab      — controlled vocabularies per field            (warning)
  max_len    — upper length bounds per field                (warning)

Execution: ONE ``mapInPandas`` pass; the compiled validator is built
per executor process on first use (module-level cache keyed by the
spec's canonical JSON) — exactly the XMLSchema singleton pattern: the
expensive compile happens once per worker, not once per batch or row.
Each rule is a VECTORIZED pandas check (whole-column ops); per-row
Python touches only the violating rows when assembling error strings.

Output: the selected columns + ``schema_ok`` boolean + ``schema_errors``
(array of 'severity:field:rule' strings) — the warn-only mode the
reference runs by default keeps every row and logs (SURVEY P3).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# per-executor compiled-schema cache (process-level, like mmd.py:51-94)
_COMPILED: dict = {}
_COMPILE_COUNT = 0   # test hook: compiles per process


def canonical_spec(spec: dict) -> str:
    return json.dumps(spec, sort_keys=True, separators=(",", ":"))


def _num_castable(s: pd.Series) -> pd.Series:
    return pd.to_numeric(s, errors="coerce").notna() | s.isna()


def compile_schema(spec_json: str):
    """JSON spec → list of (error_tag, mask_fn) where mask_fn(pdf)
    returns a boolean Series marking VIOLATIONS. Cached per process;
    compiling is the 'expensive' step by analogy (lxml parses and
    compiles the XSD grammar here)."""
    global _COMPILE_COUNT
    cached = _COMPILED.get(spec_json)
    if cached is not None:
        return cached
    _COMPILE_COUNT += 1
    spec = json.loads(spec_json)
    rules = []
    for f_ in spec.get("required", []):
        def req(pdf, f=f_):
            col = pdf[f]
            empty = col.isna()
            if col.dtype == object:
                empty |= col.astype(str).str.strip().eq("") & col.notna()
            return empty
        rules.append((f"failure:{f_}:required", req))
    for f_, tname in spec.get("types", {}).items():
        if tname in ("int", "float"):
            rules.append((f"failure:{f_}:type:{tname}",
                          lambda pdf, f=f_: ~_num_castable(pdf[f])))
    for f_, allowed in spec.get("vocab", {}).items():
        fs = frozenset(allowed)
        rules.append((f"warning:{f_}:vocab",
                      lambda pdf, f=f_, a=fs:
                      pdf[f].notna() & ~pdf[f].isin(a)))
    for f_, lim in spec.get("max_len", {}).items():
        rules.append((f"warning:{f_}:max_len:{lim}",
                      lambda pdf, f=f_, m=int(lim):
                      pdf[f].notna() & (pdf[f].str.len() > m)))
    _COMPILED[spec_json] = rules
    return rules


def validate_schema(pages: DataFrame, spec: dict,
                    columns: list[str] | None = None) -> DataFrame:
    """Append (schema_ok, schema_errors) via one Arrow-batched pass.
    ``columns`` selects what flows through (include your id column);
    defaults to the fields the rules reference — column pruning keeps
    the scan narrow."""
    spec_json = canonical_spec(spec)
    cols = columns or _referenced_fields(spec)
    out_schema = T.StructType(
        [pages.schema[c] for c in cols] + [
            T.StructField("schema_ok", T.BooleanType(), False),
            T.StructField("schema_errors", T.ArrayType(T.StringType()),
                          False),
        ])

    def run(it):
        rules = compile_schema(spec_json)   # per-process cache hit
        for pdf in it:
            n = len(pdf)
            errs = [[] for _ in range(n)]
            fatal = np.zeros(n, dtype=bool)
            for tag, mask_fn in rules:
                mask = mask_fn(pdf).to_numpy(dtype=bool, na_value=False)
                if tag.startswith("failure:"):
                    fatal |= mask
                for i in np.where(mask)[0]:   # violations only
                    errs[i].append(tag)
            out = pdf.copy()
            out["schema_errors"] = errs
            out["schema_ok"] = ~fatal
            yield out

    return pages.select(*cols).mapInPandas(run, schema=out_schema)


def validate_schema_split(pages: DataFrame, spec: dict, id_col: str,
                          columns: list[str] | None = None
                          ) -> tuple[DataFrame, DataFrame]:
    """Fail-fast mode (VERDICT r2 #6): enforcement-then-ledger, the
    reference's gate order (solrindexer/indexer.py:253-285 — schema
    failures REJECT the document and are recorded before anything is
    indexed). Returns (good, run_log):

      * good    — rows with no fatal violation (warnings kept), the
        data columns only;
      * run_log — one row per violation, schema-compatible with
        extract.validate's ledger (url, stage, severity, message;
        stage='schema', url = the id cast to string), so
        failure_analytics() and exit_code() work on the union.
    """
    from pyspark.sql import functions as F
    cols = columns or [id_col] + _referenced_fields(spec)
    out = validate_schema(pages, spec, columns=cols)
    tags = out.select(F.col(id_col), F.explode("schema_errors").alias("t"))
    run_log = tags.select(
        F.col(id_col).cast("string").alias("url"),
        F.lit("schema").alias("stage"),
        F.split(F.col("t"), ":", 2).getItem(0).alias("severity"),
        F.split(F.col("t"), ":", 2).getItem(1).alias("message"))
    good = out.filter(F.col("schema_ok")) \
        .drop("schema_ok", "schema_errors")
    return good, run_log


def _referenced_fields(spec: dict) -> list[str]:
    fields = list(spec.get("required", []))
    for key in ("types", "vocab", "max_len"):
        fields.extend(spec.get(key, {}).keys())
    seen, out = set(), []
    for f_ in fields:
        if f_ not in seen:
            seen.add(f_)
            out.append(f_)
    return out


def compile_count() -> int:
    """Test hook: schema compiles in THIS process."""
    return _COMPILE_COUNT
