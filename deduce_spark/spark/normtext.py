"""Unicode text normalization for curation pipelines.

Dedup and n-gram statistics treat byte-distinct strings as distinct, so
a corpus must be normalized BEFORE minhash/simhash/decontam or the same
sentence typed with a composed "é" (U+00E9) and a decomposed "e"+U+0301
counts as two different documents.  :func:`normalize_text` applies:

1. typographic folding — curly quotes → straight, en/em dashes → "-",
   NBSP → space (a fixed char-for-char ``translate`` table);
2. Unicode NFC — canonical composition, the normalization both engines
   implement identically (DuckDB ``nfc_normalize`` == Python
   ``unicodedata.normalize("NFC", …)``; equivalence pinned by test on
   composed/decomposed/ligature/fullwidth inputs).

Subset honesty: NFC, not NFKC — compatibility folds (ligatures "ﬁ",
fullwidth forms, "½") are NOT applied because DuckDB has no NFKC twin
to oracle them against; the fold table handles the high-frequency
typographic cases explicitly instead.

Scale shape: ONE Arrow-batched ``mapInPandas`` stage (vectorized pandas
``str.translate`` + ``str.normalize``) — NFC is the one transformation
Spark has no native expression for; everything around it stays native.
No shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame

from deduce_spark.spark.parallel import fan_out

# char-for-char typographic folds (must stay char-for-char: both
# engines' translate() map single codepoints).  Escapes, not
# literals: an invisible NBSP in source is unreviewable.
_FOLD_FROM = "\u2019\u2018\u201c\u201d\u2014\u2013\u00a0"
_FOLD_TO = "''\"\"-- "

_FOLD_TABLE = {ord(a): b for a, b in zip(_FOLD_FROM, _FOLD_TO)}


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, norm_text, changed)`` — folded + NFC-normalized text
    and a 0/1 flag marking rows the normalization actually altered
    (the cheap pre-filter for an incremental re-dedup)."""
    import pandas as pd

    id_type = dict(docs.dtypes)[id_col]

    def gen(batches):
        for pdf in batches:
            s = pdf[text_col].astype("object")
            out = s.str.translate(_FOLD_TABLE).str.normalize("NFC")
            # NULL text normalizes to NULL and counts as UNCHANGED —
            # (out != s) alone evaluates NaN != None as True and would
            # flag untouched rows (and diverge from the SQL twin's
            # NULL-comparison semantics)
            changed = ((out != s) & s.notna()).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "norm_text": out,
                    "changed": changed,
                }
            )

    # single-row-group inputs otherwise normalize on ONE core
    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        gen, f"doc_id {id_type}, norm_text string, changed int"
    )


def normalize_text_oracle_sql(
    docs_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`normalize_text` (translate + nfc_normalize
    — same fold table, same NFC)."""
    frm = _FOLD_FROM.replace("'", "''")
    to = _FOLD_TO.replace("'", "''")
    norm = f"nfc_normalize(translate({text_col}, '{frm}', '{to}'))"
    return f"""
        SELECT {id_col} AS doc_id,
               {norm} AS norm_text,
               COALESCE(({norm} <> {text_col})::INT, 0) AS changed
        FROM ({docs_sql})
    """
