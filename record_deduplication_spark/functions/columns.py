"""P5: fuzzy column auto-detection.

Driver-side schema inspection mirroring the reference's detection
semantics exactly (/root/reference/src/core/preprocess_engine.py:234-285):

- company: exact lowercase name match against a candidate list first,
  then substring containment;
- domain: exact match only;
- phone: substring containment;
- address: ALL columns containing an address-ish term (multi-column);
- id: exact match first (including the space variants "sys id" /
  "system id"), then substring containment of id/key/identifier.

The engine's own input schema is fixed (Iceberg `clips`,
SURVEY.md §1.3) so this survives as a helper for ad-hoc/CSV inputs and
tests — exactly the thin `resolve_columns()` SURVEY §1.2 promises.
"""

from __future__ import annotations

_COMPANY = ("company", "company_name", "organization", "org", "business",
            "firm", "name")
_DOMAIN = ("domain", "website", "url", "web", "site", "email")
_PHONE = ("phone", "telephone", "tel", "mobile", "cell")
_ADDRESS = ("address", "street", "city", "state", "zip", "postal", "location")
_ID_EXACT = ("id", "record_id", "sys id", "system id", "identifier", "key",
             "sys_id", "system_id")
_ID_SUB = ("id", "key", "identifier")


def _exact(columns: list[str], names: tuple[str, ...]) -> str | None:
    for col in columns:
        if col.lower() in names:
            return col
    return None


def _containing(columns: list[str], names: tuple[str, ...]) -> str | None:
    for col in columns:
        low = col.lower()
        if any(n in low for n in names):
            return col
    return None


def address_concat(cols: list[str]):
    """P4: join non-null address parts with single spaces and collapse
    whitespace, as a native column expression (whole-stage codegen; the
    reference does a per-row python join —
    /root/reference/src/core/preprocess_engine.py:108-114)."""
    from pyspark.sql import functions as F

    joined = F.concat_ws(" ", *[F.col(c) for c in cols])  # skips NULLs
    return F.trim(F.regexp_replace(joined, r"\s+", " "))


def resolve_columns(columns: list[str]) -> dict:
    """Map a raw column list to the dedup roles. Missing roles map to
    None (address: empty list) — downstream stages degrade gracefully,
    like the reference's optional-column handling
    (/root/reference/src/core/blocking_engine.py:68-93)."""
    address = [c for c in columns
               if any(n in c.lower() for n in _ADDRESS)]
    return {
        "company": _exact(columns, _COMPANY) or _containing(columns, _COMPANY),
        "domain": _exact(columns, _DOMAIN),
        "phone": _containing(columns, _PHONE),
        "address": address,
        "id": _exact(columns, _ID_EXACT) or _containing(columns, _ID_SUB),
    }


def coerce_digit_id(col: str):
    """M6: align label/feature id dtypes by extracting the digit run
    from a possibly-prefixed id ("rec_00123" -> 123L; NULL when no
    digits). The reference regex-extracts + astypes the same way
    (/root/reference/src/core/model_engine.py:173-193,281-299) — here
    one regexp_extract expression, no UDF."""
    from pyspark.sql import functions as F

    digits = F.regexp_extract(F.col(col).cast("string"), "([0-9]+)", 1)
    return F.when(digits != "", digits.cast("long"))


def hash_split(df, id_col: str, weights: dict[str, float] | None = None,
               seed: int = 0, out_col: str = "split"):
    """Deterministic train/valid/test assignment: a pure function of
    the row id (xxhash64 bucket), so the split is stable across runs,
    partitionings, and cluster sizes — the property that matters when
    10^12 rows are re-sharded between pipeline versions. No shuffle,
    no sampling state; one codegen projection.

    Gate twin: `hash_split_assign` pins the semantics with the
    md5-based hash DuckDB shares."""
    from pyspark.sql import functions as F

    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"hash_split weights must sum to 1: {weights}")
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                    F.lit(1_000_000))
    expr, lo = None, 0.0
    for name, w in weights.items():
        hi = lo + w
        cond = bucket < F.lit(int(round(hi * 1_000_000)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)
