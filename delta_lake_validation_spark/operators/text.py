"""Text-analysis operators beyond the plans/llm.py scalar queries:
language identification via marker-token / charset heuristics, entirely in
Catalyst expressions (no UDF, codegen-friendly, linear scale)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MARKERS = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "und", "die", "das", "nicht"),
    "fr": ("le", "et", "les", "des", "une"),
    "es": ("el", "y", "los", "las", "una"),
}
_CJK = r"[一-鿿]"


def _marker_count(toks: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(m) for m in MARKERS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predict language from marker-token votes + CJK charset detection.

    Deterministic tie order: zh (charset) beats all; then de > fr > es must
    strictly beat en to displace it (en is the prior).  Returns
    (id, predicted_lang, c_en..c_es marker counts).
    """
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    c = {lang: _marker_count(toks, lang) for lang in MARKERS}
    has_cjk = F.regexp_count(F.col(text_col) if isinstance(text_col, str) else text_col, F.lit(_CJK)) > 0
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when((c["de"] > c["en"]) & (c["de"] >= c["fr"]) & (c["de"] >= c["es"]), F.lit("de"))
        .when((c["fr"] > c["en"]) & (c["fr"] >= c["es"]), F.lit("fr"))
        .when(c["es"] > c["en"], F.lit("es"))
        .otherwise(F.lit("en"))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        pred.alias("predicted_lang"),
        *[c[lang].cast("int").alias(f"c_{lang}") for lang in MARKERS],
    )
