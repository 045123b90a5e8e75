"""Fixed-width sequence tokenization (SURVEY.md §2 j1 / b5).

Reference behavior (/root/reference/src/process_to_curated.py:22-29): a
HuggingFace ``AutoTokenizer`` (ESM2 — character-per-amino-acid vocab) applied
row-at-a-time via ``df[col].apply``, padded/truncated to 1024, then exploded
into 1024 physical ``token_i`` int columns.

Spark-first rebuild:
- The hot path is a pure JVM expression pipeline — ``transform(sequence(...))``
  over codepoints with pad via ``array_repeat`` — no Python in the loop at
  all (the reference pays per-row Python + tokenizer overhead).
- Tokens live in ONE ``ArrayType(IntegerType())`` column internally; the
  1024-wide physical layout (which would knock Spark off whole-stage codegen,
  default ``spark.sql.codegen.maxFields=100``) exists only as an export
  projection (``widen_tokens``).
- An optional HuggingFace path via ``mapInPandas`` (tokenizer loaded once per
  partition, Arrow-batched — fixing the reference's per-row overhead) is
  gated on ``transformers`` being importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.compute import spread


def tokenize_chars(
    df: DataFrame,
    text_col: str,
    max_len: int = 1024,
    pad_id: int = 0,
    out_col: str = "tokens",
) -> DataFrame:
    """j1 — deterministic char→codepoint tokenization, padded/truncated to
    ``max_len``. Codepoint ids keep the operator dependency-free and
    oracle-portable; swapping in any fixed char→id map is a one-expression
    change."""
    # sequence(1, 0) DESCENDS in Spark (auto step -1) — guard the empty case.
    body = F.when(
        F.length(text_col) == 0, F.expr("cast(array() AS array<int>)")
    ).otherwise(
        F.expr(
            f"transform(sequence(1, least(length({text_col}), {max_len})), "
            f"i -> ascii(substr({text_col}, i, 1)))"
        )
    )
    padded = F.concat(
        body,
        F.array_repeat(
            F.lit(pad_id), F.lit(max_len) - F.least(F.length(text_col), F.lit(max_len))
        ),
    )
    # per-char substr runs interpreted — spread so one input file ≠ one task
    return spread(df).withColumn(out_col, padded.cast("array<int>"))


# The public ESM2 vocabulary (facebook/esm2_t6_8M_UR50D vocab.txt, 33 tokens):
# ids 0-3 are <cls>/<pad>/<eos>/<unk>; ids 4-30 are EXACTLY the characters of
# this string in order (L=4, A=5, ... '.'=29, '-'=30); 31-32 are
# <null_1>/<mask> (never emitted by plain tokenization). The consecutive
# layout means `instr(vocab, ch) + 3` IS the vocab lookup, with instr's
# 0-on-miss collapsing unknown characters to <unk>=3 for free.
ESM2_CHARS = "LAGVSERTIDPKQNFYMHWCXBUZO.-"
ESM2_CLS, ESM2_PAD, ESM2_EOS, ESM2_UNK = 0, 1, 2, 3


def tokenize_esm2(
    df: DataFrame,
    text_col: str,
    max_len: int = 1024,
    out_col: str = "tokens",
) -> DataFrame:
    """j1 — EXACT ESM2 vocab-id tokenization (parity with the reference's
    HF ``facebook/esm2_t6_8M_UR50D`` default,
    /root/reference/src/process_to_curated.py:22-29,85) as a pure JVM
    expression pipeline — no ``transformers`` needed, no Python in the loop.

    HF semantics reproduced: per-character ids, body truncated to
    ``max_len - 2`` so ``<cls>`` + body + ``<eos>`` fits, then padded with
    ``<pad>``=1 to exactly ``max_len``; characters outside the vocab become
    ``<unk>``=3 (EsmTokenizer does not case-fold, so neither do we)."""
    body_len = F.least(F.length(text_col), F.lit(max_len - 2))
    # sequence(1, 0) DESCENDS in Spark (auto step -1) — guard the empty case.
    body = F.when(
        F.length(text_col) == 0, F.expr("cast(array() AS array<int>)")
    ).otherwise(
        F.expr(
            f"transform(sequence(1, least(length({text_col}), {max_len - 2})), "
            f"i -> cast(instr('{ESM2_CHARS}', substr({text_col}, i, 1)) + 3 "
            f"AS int))"
        )
    )
    padded = F.concat(
        F.array(F.lit(ESM2_CLS)),
        body,
        F.array(F.lit(ESM2_EOS)),
        F.array_repeat(F.lit(ESM2_PAD), F.lit(max_len - 2) - body_len),
    )
    # per-char substr runs interpreted — spread so one input file ≠ one task
    return spread(df).withColumn(out_col, padded.cast("array<int>"))


def widen_tokens(df: DataFrame, tokens_col: str = "tokens", width: int = 1024) -> DataFrame:
    """b5 — export-only wide projection token_0..token_{width-1} (the
    reference's curated layout). Keep arrays internally; this is for final
    export parity only."""
    return df.select(
        "*", *[F.col(tokens_col)[i].alias(f"token_{i}") for i in range(width)]
    )


def tokenize_hf(df: DataFrame, text_col: str, model: str, max_len: int = 1024):
    """EXPERIMENTAL — HuggingFace tokenizer path (parity with the reference's
    ESM2 default, /root/reference/src/process_to_curated.py:85), batched via
    mapInPandas with one tokenizer load per partition.

    Status: `transformers` is not installed in this image and the hub is not
    reachable, so this path has never executed here — the import gate and
    plan contract are tested (tests/test_tokenize_hf.py); the execution test
    is skip-gated until an environment provides the package + weights. Use
    `tokenize_chars` for the supported deterministic path.

    Raises ImportError (driver-side, at plan time) when `transformers` is
    absent.
    """
    import transformers  # noqa: F401 — gate; raises if unavailable

    schema = df.schema.add("tokens", "array<int>")

    def run(batches):
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model)
        for pdf in batches:
            enc = tok(
                list(pdf[text_col]),
                padding="max_length",
                truncation=True,
                max_length=max_len,
            )["input_ids"]
            yield pdf.assign(tokens=list(enc))

    return df.mapInPandas(run, schema=schema)
