"""HF tokenizer path (SURVEY.md §2 j1; VERDICT r2 item 7).

The reference's curated zone is HuggingFace ``AutoTokenizer`` output
(src/process_to_curated.py:22-29, ESM2 default :85). `tokenize_hf` is the
Spark-side analog (mapInPandas, tokenizer loaded once per partition). The
`transformers` package is not in this image, so the execution test is GATED
on importability + model availability; the operator is marked EXPERIMENTAL
until it has run somewhere. The always-on test pins the gate's failure mode
(clean ImportError, not a worker-side crash at action time).
"""

from __future__ import annotations

import pytest

from data_lakes_tp2_student_spark.operators.tokenize import (
    tokenize_chars,
    tokenize_hf,
)


def test_tokenize_hf_gates_cleanly_without_transformers(spark):
    """Without `transformers`, tokenize_hf must raise ImportError at PLAN
    time (driver-side gate) — never a late executor crash."""
    try:
        import transformers  # noqa: F401
    except ImportError:
        df = spark.createDataFrame([("ACDE",)], "text string")
        with pytest.raises(ImportError):
            tokenize_hf(df, "text", model="facebook/esm2_t6_8M_UR50D")
        return
    pytest.skip("transformers present; covered by the execution test below")


def test_tokenize_hf_contract(spark):
    """Execution contract vs the builtin char tokenizer: same row count, the
    configured max_len, deterministic output. Runs only where transformers
    AND the tokenizer weights are available (needs network or a local HF
    cache — neither exists in this image)."""
    transformers = pytest.importorskip("transformers")
    model = "facebook/esm2_t6_8M_UR50D"
    try:
        transformers.AutoTokenizer.from_pretrained(model)
    except Exception as e:  # noqa: BLE001 — offline image: no hub access
        pytest.skip(f"tokenizer weights unavailable ({type(e).__name__})")
    df = spark.createDataFrame(
        [(1, "ACDEFGHIKL"), (2, "MNPQRSTVWY"), (3, "")], "doc_id long, text string"
    )
    hf = tokenize_hf(df, "text", model=model, max_len=32).collect()
    ch = tokenize_chars(df, "text", max_len=32).collect()
    assert len(hf) == len(ch) == 3
    for row in hf:
        assert len(row.tokens) == 32
    again = tokenize_hf(df, "text", model=model, max_len=32).collect()
    assert sorted(map(str, hf)) == sorted(map(str, again))
