"""E11: API item -> RawJob projection (SURVEY §2.4).

The reference flattens each API JSON item into the schemaless
``raw_data`` map with renamed keys — vieclam24h/crawler.go:219-280
(~30 fields), vietnamworks/crawler.go:144-201, topdev/crawler.go's
attribute pulls. Engine form: a DECLARATIVE mapping
``out_column -> (json_path, sql_type)`` compiled to built-in
``get_json_object`` + ``try_cast`` columns — JVM-side, codegen, no
UDF, and a user can point it at a brand-new API payload by writing a
mapping instead of code (the raw layer the round-1 verdict flagged as
living only in the fixture generator).

Missing keys project to NULL, which the normalizer's getString /
getInt / getFloat coalesce into Go zero values — the same tolerance
the reference's map pulls have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# vieclam24h API item -> raw_data keys (vieclam24h/crawler.go:219-280).
# Paths are the API field names; output names are the raw_data keys the
# normalizer consumes (normalizer.go:137-250).
VIECLAM24H_API_MAPPING: dict[str, tuple[str, str]] = {
    "id": ("$.id", "string"),
    "title": ("$.title", "string"),
    "companyName": ("$.employer_info.name", "string"),
    "contactAddress": ("$.contact_address", "string"),
    "salaryFrom": ("$.salary_from", "long"),
    "salaryTo": ("$.salary_to", "long"),
    "salaryText": ("$.salary_text", "string"),
    "experience": ("$.experience_text", "string"),
    "jobRequirement": ("$.job_requirement", "string"),
    "otherRequirement": ("$.other_requirement", "string"),
    "jobDescription": ("$.job_description", "string"),
    "benefit": ("$.benefit", "string"),
    "totalViews": ("$.total_views", "long"),
    "totalResumeApplied": ("$.total_resume_applied", "long"),
    "rateResponse": ("$.rate_response", "double"),
    "expiredOn": ("$.expired_on", "long"),
    "updatedOn": ("$.updated_on", "long"),
}


def project_api_items(df: DataFrame, json_col: str,
                      mapping: dict[str, tuple[str, str]],
                      keep: list[str] | None = None) -> DataFrame:
    """Flatten a JSON API payload column into typed raw columns.

    mapping: {out_col: (json_path, sql_type)}. get_json_object returns
    NULL for absent paths; try_cast returns NULL for malformed values —
    both feed the normalizer's zero-value coalescing exactly like the
    reference's ``map[string]any`` pulls."""
    keep_cols = [F.col(c) for c in (keep or [])]
    proj = [F.get_json_object(F.col(json_col), path).try_cast(t).alias(name)
            for name, (path, t) in mapping.items()]
    return df.select(*keep_cols, *proj)
