"""Deterministic scale-up of the driver testdata (VERDICT r9 item 1).

Produces an sf1-equivalent (or any integer factor F) dataset from
/root/testdata/sf0.1 by REPLICATION WITH PERTURBATION — the same
scaling law the driver's own generators follow between sf0.01 and
sf0.1 (measured: date/time domains stay FIXED, row density and key
cardinalities grow; events keep the same 30-day window with 10x the
users, orders keep the 1995-2001 range with 10x the customers):

- dimension/fact tables (customer, supplier, part, orders, lineitem):
  F stamped copies with every key column shifted by k * (max_key + 1),
  so foreign keys stay consistent, per-key group sizes stay constant
  (lines per order, orders per customer), and every value distribution
  is preserved exactly;
- events: copies shift event_id/user_id and nudge ts by k*7 seconds
  (same 30-day window, 10x density — the driver's own law);
- documents: copies get deterministically PERTURBED text (rotation +
  ~1/3 vocabulary substitutions keyed on (doc_id, copy, position)), so
  each copy reproduces the original's internal near-duplicate
  structure without creating cross-copy near-duplicates — dedup
  workloads scale linearly in corpus size, as a real 10x corpus with
  the same duplication rate would; n_chars is recomputed;
- embeddings: copies get small deterministic Gaussian jitter (cluster
  structure preserved, no exact-duplicate vectors);
- region, nation: fixed (like TPC-H).

Everything is seeded/arithmetic — two runs produce identical bytes.
Output: /tmp/scaledata/sfx{F}/<table>.parquet (single files, 256k-row
row groups so Spark still splits them across tasks).

Usage: python scripts/gen_scale_data.py [factor=10] [src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 256_000


def _write(df: pd.DataFrame, src_path: str, out_path: str) -> None:
    """Write with the SOURCE file's arrow schema (types preserved —
    float32 embedding lists, timestamp units — so Spark/DuckDB read the
    scaled tables exactly like the originals)."""
    schema = pq.read_schema(src_path)
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, out_path, row_group_size=ROW_GROUP)


def _shift(col: pd.Series, k: int) -> pd.Series:
    return col + k * (int(col.max()) + 1)


def replicate_keyed(
    df: pd.DataFrame, factor: int, shifts: dict[str, int]
) -> pd.DataFrame:
    """F stamped copies; each key column moves by k * its key family's
    base. FK columns MUST use the PARENT table's base (max parent key +
    1), not their own max — o_custkey's max can be below c_custkey's,
    and mismatched bases would break every join in the scaled copies."""
    out = []
    for k in range(factor):
        c = df.copy()
        for col, base in shifts.items():
            c[col] = df[col] + k * base
        out.append(c)
    return pd.concat(out, ignore_index=True)


def scale_events(df: pd.DataFrame, factor: int) -> pd.DataFrame:
    out = []
    for k in range(factor):
        c = df.copy()
        c["event_id"] = _shift(df["event_id"], k)
        c["user_id"] = _shift(df["user_id"], k)
        if np.issubdtype(df["ts"].dtype, np.datetime64):
            c["ts"] = df["ts"] + pd.to_timedelta(k * 7, unit="s")
        else:  # nanos-as-long generation of the driver tables
            c["ts"] = df["ts"] + k * 7 * 1_000_000_000
        out.append(c)
    return pd.concat(out, ignore_index=True)


def scale_documents(df: pd.DataFrame, factor: int) -> pd.DataFrame:
    vocab = sorted({w for t in df["text"] for w in t.split(" ") if w})
    V = len(vocab)
    out = [df.copy()]
    for k in range(1, factor):
        c = df.copy()
        c["doc_id"] = _shift(df["doc_id"], k)
        texts = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            words = text.split(" ")
            rot = k % max(1, len(words))
            words = words[rot:] + words[:rot]
            for i in range(len(words)):
                if (i + k) % 3 == 0:
                    words[i] = vocab[(int(doc_id) * 31 + i * 7 + k * 13) % V]
            texts.append(" ".join(words))
        c["text"] = texts
        c["n_chars"] = [len(t) for t in texts]
        out.append(c)
    return pd.concat(out, ignore_index=True)


def scale_documents_constant(
    df: pd.DataFrame, factor: int, dup_frac: float = 0.10
) -> pd.DataFrame:
    """Round 12 (VERDICT r11 item 2): grow the corpus with NEW documents
    at a FIXED duplication rate, instead of perturbed copies of the base.

    The legacy `scale_documents` mode replicates every base doc F times
    with perturbation; copy-pairs of one source doc still share real
    substrings, so PAIR-relation queries (x32/x32b/x2f) see an output
    quadratic in F — a property of the FIXTURE, not of a real corpus
    whose dup rate is scale-invariant. Here every copy k >= 1 holds
    len(df) FRESH documents: words sampled (seeded, deterministic) from
    the base corpus's empirical unigram distribution, lengths mirroring
    the base length distribution — so no long substring is shared across
    copies or with the base — and then the last `dup_frac` of the copy's
    docs are near-clones of distinct earlier docs IN THE SAME COPY
    (cluster size 2, every 40th word substituted → 1-2 changed words per
    ~54-word doc: preserved ~39-word runs keep x32's 5-word windows and
    x32b's >=6-word spans findable, MinHash jaccard ~0.95, and the
    SimHash fingerprint inside its hamming band — with the large
    synthetic vocab every substitution swaps a RARE token, so a denser
    12-word stride flipped too many fingerprint bits for x2f to see the
    pair at all). Result: the true pair relation grows ~linearly in F;
    the per-copy planted DENSITY is a design constant that differs per
    query family from the base corpus's internal density, so single-F
    out_ratios carry that constant — LINEARITY is evidenced by the
    rows growth between the 10c and 30c fixtures (≈3x for linear,
    ≈10x for quadratic)."""
    # Fresh docs draw from a LARGE synthetic uniform vocabulary, not the
    # base corpus's word distribution: the driver's documents table has
    # only ~31 distinct words, so i.i.d. resampling of that vocab makes
    # chance 5-gram matches and chance SimHash proximity COMMON — and the
    # cross-copy chance terms grow as F², which is exactly the fixture
    # quadratic this mode exists to remove (measured: x32 out_ratio 99.5
    # at 10x under empirical resampling vs the planted-linear design).
    # A 20k-word uniform vocab puts the chance 5-gram probability at
    # (1/20000)^5 — zero at any reachable corpus size — and growing
    # vocabulary with corpus size is the realistic law anyway (Heaps).
    W = 20_000
    vocab = np.array([f"w{j:05d}" for j in range(W)])
    n = len(df)
    lengths = df["text"].str.split(" ").str.len().to_numpy()
    out = [df.copy()]
    for k in range(1, factor):
        rng = np.random.RandomState(20_000 + k)
        flat = vocab[rng.randint(0, W, size=int(lengths.sum()))]
        cuts = np.cumsum(lengths)[:-1]
        texts = [" ".join(chunk) for chunk in np.split(flat, cuts)]
        nd = int(n * dup_frac)
        for j in range(nd):
            src = j % (n - nd)
            words = texts[src].split(" ")
            for t in range(0, len(words), 40):
                words[t] = vocab[(j * 31 + t * 7 + k * 13) % W]
            texts[n - nd + j] = " ".join(words)
        c = df.copy()
        c["doc_id"] = _shift(df["doc_id"], k)
        c["text"] = texts
        c["n_chars"] = [len(t) for t in texts]
        out.append(c)
    return pd.concat(out, ignore_index=True)


def scale_embeddings(df: pd.DataFrame, factor: int) -> pd.DataFrame:
    base = np.vstack(df["embedding"].to_numpy()).astype(np.float32)
    std = float(base.std())
    out = [df.copy()]
    for k in range(1, factor):
        c = df.copy()
        c["vec_id"] = _shift(df["vec_id"], k)
        rng = np.random.RandomState(10_000 + k)
        jit = (base + rng.normal(0.0, 0.15 * std, base.shape)).astype(np.float32)
        c["embedding"] = [row for row in jit]
        out.append(c)
    return pd.concat(out, ignore_index=True)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # docs mode: "perturb" (legacy replicated copies — kept for row
    # continuity) or "constant" (round 12: fixed dup rate, fresh docs;
    # output dir gets a `c` suffix so both fixtures coexist)
    docs_mode = sys.argv[3] if len(sys.argv) > 3 else "perturb"
    assert docs_mode in ("perturb", "constant"), docs_mode
    suffix = "c" if docs_mode == "constant" else ""
    dest = f"/tmp/scaledata/sfx{factor}{suffix}"
    os.makedirs(dest, exist_ok=True)

    # key-family shift bases come from the PARENT tables
    def _base(table: str, col: str) -> int:
        s = pq.read_table(f"{src}/{table}.parquet", columns=[col])
        return int(pa.compute.max(s[col]).as_py()) + 1

    kc = _base("customer", "c_custkey")
    ks = _base("supplier", "s_suppkey")
    kp = _base("part", "p_partkey")
    ko = _base("orders", "o_orderkey")
    plans = {
        "region": {},
        "nation": {},
        "customer": {"c_custkey": kc},
        "supplier": {"s_suppkey": ks},
        "part": {"p_partkey": kp},
        "orders": {"o_orderkey": ko, "o_custkey": kc},
        "lineitem": {"l_orderkey": ko, "l_partkey": kp, "l_suppkey": ks},
    }
    for t, shifts in plans.items():
        p = f"{src}/{t}.parquet"
        df = pq.read_table(p).to_pandas()
        big = replicate_keyed(df, factor, shifts) if shifts else df
        _write(big, p, f"{dest}/{t}.parquet")
        print(f"{t}: {len(df)} -> {len(big)}")
    docs_fn = (
        scale_documents_constant if docs_mode == "constant" else scale_documents
    )
    for t, fn in (
        ("events", scale_events),
        ("documents", docs_fn),
        ("embeddings", scale_embeddings),
    ):
        p = f"{src}/{t}.parquet"
        df = pq.read_table(p).to_pandas()
        big = fn(df, factor)
        _write(big, p, f"{dest}/{t}.parquet")
        print(f"{t}: {len(df)} -> {len(big)}")
    print("done:", dest)


if __name__ == "__main__":
    main()
