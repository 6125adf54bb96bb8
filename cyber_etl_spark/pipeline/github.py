"""GitHub API result normalization — SURVEY.md stages 8-9
(gitlinks/githubDataProcessing.ipynb; data_integration.ipynb cells 60-75).

Bronze inputs are the batched API results (FIXTURES.md §1.4); the REST
extraction itself (rate-limited driver loop, gitapi.py) is outside the
engine boundary.  The pandas positional-index joins (J3) become explicit
``ref_id`` keys carried from extraction time — deterministic, shuffle-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def github_language_edges(languages_raw: DataFrame) -> DataFrame:
    """(ref_id, url, language, ratio) — explode the per-repo languages map
    (R3, data_integration.ipynb:4255 cell 71).

    Divergences from the reference, fixed forward:
    - ratio stays DOUBLE (the reference stringified it, SURVEY §1.3);
    - rows whose 'language' is an error-payload key (documentation_url,
      message) are dropped with literal matches, and null ratios are
      dropped (cell 75 dropna).
    """
    exploded = (
        languages_raw.where(F.col("status") == "success")
        .select(
            F.col("original_index").alias("ref_id"),
            "url",
            F.explode("languages").alias("language", "ratio"),
        )
        .where(F.col("ratio").isNotNull())
    )
    return exploded.where(~F.col("language").isin("documentation_url", "message"))


def github_user_edges(contributors_raw: DataFrame) -> DataFrame:
    """(ref_id, url, login) — struct expansion (R4/J4: the reference's
    ``contributors.apply(pd.Series)`` + concat is just ``col('c.*')``),
    failed fetches and bot accounts dropped.

    Reference bug §2.12.2 fixed forward: pandas ``str.contains("[bot]")``
    is a regex *character class* that silently drops any login containing
    b/o/t; the intent was the literal '[bot]' marker — implemented here
    as a literal substring match.
    """
    rows = (
        contributors_raw.where(F.col("status") == "success")
        .select(
            F.col("original_index").alias("ref_id"),
            "url",
            F.col("contributors.login").alias("login"),
        )
        .where(F.col("login").isNotNull())
    )
    return rows.where(~F.col("login").contains("[bot]")).distinct()
