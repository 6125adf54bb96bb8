"""Python UDTF surface (Spark 4): table-valued functions for fan-out
transforms that need per-row Python but table-shaped output.

The library prefers built-in explode/posexplode (see q12/q56); a UDTF is
the escape hatch when the fan-out logic itself needs Python (stateful
parsers, third-party tokenizers).  ``split_sections`` demonstrates the
shape with a deterministic paragraph/段 splitter.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="section_id: int, section_text: string, n_tokens: int")
class SplitSections:
    """doc text → one row per section (sections separated by '||' or
    double newlines), with a per-section token count."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"\|\||\n\n", text)]
        for i, p in enumerate(parts):
            if p:
                yield i, p, len(p.split())


def split_sections(spark, df, text_col: str = "text", id_col: str = "doc_id"):
    """Apply the UDTF laterally: (id, section_id, section_text, n_tokens)."""
    df.createOrReplaceTempView("_udtf_in")
    spark.udtf.register("split_sections", SplitSections)
    return spark.sql(
        f"""
        SELECT t.{id_col}, s.section_id, s.section_text, s.n_tokens
        FROM _udtf_in t, LATERAL split_sections(t.{text_col}) s
        """
    )
