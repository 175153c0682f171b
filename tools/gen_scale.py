"""Generate a LARGER scale factor from the driver's sf0.1 testdata for
one-off scale probes (PERF.md): relational tables replicate with
consistent key offsets (joins keep their selectivity shape — exactly
what a larger TPC-H SF looks like), events replicate with fresh
user/event ids over the same 30-day window (larger SF = denser stream),
and documents/embeddings are SYNTHESIZED fresh with the sf0.1
distribution profile (31-word vocab, 10-100 uniform word counts,
lang/source mixes, ~0.16% planted exact dups + ~2% near-dups,
L2-normalized gaussian 64-dim embeddings) — naive 10x cloning would
hand the near-dup queries 10-clone clusters and invalidate the probe.

Usage: python tools/gen_scale.py /tmp/sfscale/sf1 [multiplier]
(default multiplier 10; reads /root/testdata/sf0.1). Deterministic
(seed 42). Writes one parquet per table, like the driver's dirs.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def _offset(col: pa.ChunkedArray, off: int) -> pa.Array:
    import pyarrow.compute as pc

    return pc.add(col, off)


def replicate_relational(out_dir: str, mult: int) -> None:
    """customer/supplier/part/orders/lineitem replicate `mult` times;
    copy i offsets every key AND foreign key by i * (max_key + 1) of
    its dimension, so each copy is a self-contained star that joins
    exactly like the original — region/nation (fixed dims) copy
    through."""
    import pyarrow.compute as pc

    for name in ("region", "nation"):
        pq.write_table(_read(name), os.path.join(out_dir, f"{name}.parquet"))

    tables = {
        n: _read(n)
        for n in ("customer", "supplier", "part", "orders", "lineitem")
    }
    spans = {
        "cust": pc.max(tables["customer"]["c_custkey"]).as_py() + 1,
        "supp": pc.max(tables["supplier"]["s_suppkey"]).as_py() + 1,
        "part": pc.max(tables["part"]["p_partkey"]).as_py() + 1,
        "order": pc.max(tables["orders"]["o_orderkey"]).as_py() + 1,
    }
    key_map = {
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "order", "o_custkey": "cust"},
        "lineitem": {
            "l_orderkey": "order",
            "l_partkey": "part",
            "l_suppkey": "supp",
        },
    }
    for name, tab in tables.items():
        copies = []
        for i in range(mult):
            cols = {}
            for c in tab.column_names:
                span = key_map[name].get(c)
                cols[c] = (
                    _offset(tab[c], i * spans[span])
                    if span is not None
                    else tab[c]
                )
            copies.append(pa.table(cols))
        pq.write_table(
            pa.concat_tables(copies),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def replicate_events(out_dir: str, mult: int) -> None:
    import pyarrow.compute as pc

    tab = _read("events")
    ev_span = pc.max(tab["event_id"]).as_py() + 1
    user_span = pc.max(tab["user_id"]).as_py() + 1
    copies = []
    for i in range(mult):
        cols = {
            c: (
                _offset(tab[c], i * ev_span)
                if c == "event_id"
                else _offset(tab[c], i * user_span)
                if c == "user_id"
                else tab[c]
            )
            for c in tab.column_names
        }
        copies.append(pa.table(cols))
    pq.write_table(
        pa.concat_tables(copies), os.path.join(out_dir, "events.parquet")
    )


def synth_documents(out_dir: str, mult: int, rng) -> None:
    src = _read("documents")
    n = src.num_rows * mult
    vocab = sorted(
        {
            w
            for t in src["text"].to_pylist()[:500]
            for w in t.split(" ")
        }
    )
    # Heaps' law: a 10x corpus has a LARGER vocabulary, not the same
    # words 10x denser. Keeping the base vocab constant saturates the
    # shingle space (every shingle's df grows linearly with the corpus,
    # so every shingle becomes a stop-shingle and exact-Jaccard
    # candidate pairs grow quadratically — a probe artifact, not a real
    # corpus shape). Extend it ~n^0.6 with synthetic tail words and
    # draw words Zipfian (the base words stay the high-frequency head),
    # so document-frequency keeps the head+tail shape pruning relies
    # on at any scale.
    extra = max(0, int(len(vocab) * (mult ** 0.6)) - len(vocab))
    vocab = vocab + [f"zw{i:04d}" for i in range(extra)]
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = ranks ** -1.07
    zipf_p /= zipf_p.sum()
    langs, lang_w = ["en", "zh", "es", "fr", "de"], [0.41, 0.15, 0.15, 0.15, 0.14]
    n_sources = 20
    texts: list[str] = []
    base = []
    for i in range(n):
        wc = int(rng.integers(10, 101))
        words = rng.choice(vocab, size=wc, p=zipf_p)
        texts.append(" ".join(words))
        base.append(i)
    # Planted duplicates: ~0.16% exact clones, ~2% near-dups (clone with
    # ~10% of words swapped) — the sf0.1 profile, kept so the dedup
    # queries do the same KIND of work at 10x volume.
    n_exact = int(n * 0.0016)
    n_near = int(n * 0.02)
    for j in rng.choice(n, size=n_exact, replace=False):
        texts[int(j)] = texts[int(rng.integers(0, n))]
    for j in rng.choice(n, size=n_near, replace=False):
        srci = int(rng.integers(0, n))
        ws = texts[srci].split(" ")
        for k in rng.choice(len(ws), size=max(1, len(ws) // 10), replace=False):
            ws[int(k)] = str(rng.choice(vocab, p=zipf_p))
        texts[int(j)] = " ".join(ws)
    lang_col = rng.choice(langs, size=n, p=lang_w)
    src_col = [f"src{int(x)}" for x in rng.integers(0, n_sources, size=n)]
    tab = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([str(x) for x in lang_col], type=pa.string()),
            "source": pa.array(src_col, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tab, os.path.join(out_dir, "documents.parquet"))


def synth_embeddings(out_dir: str, mult: int, rng) -> None:
    src = _read("embeddings")
    n = src.num_rows * mult
    dim = len(src["embedding"][0].as_py())
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                [int(x) for x in rng.integers(0, 10, size=n)],
                type=pa.int32(),
            ),
        }
    )
    pq.write_table(tab, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    if out_dir.startswith("-"):
        # A typo'd flag once produced a committed 154 MB `--help/` dir;
        # refuse option-like output paths outright.
        raise SystemExit(
            f"refusing option-like output path {out_dir!r}; "
            "pass a real directory (e.g. /tmp/sfscale/sf1)"
        )
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    replicate_relational(out_dir, mult)
    replicate_events(out_dir, mult)
    synth_documents(out_dir, mult, rng)
    synth_embeddings(out_dir, mult, rng)
    for f in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, f)
        print(f, pq.read_metadata(p).num_rows, f"{os.path.getsize(p)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
