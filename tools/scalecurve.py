"""Scaling-curve evidence for the nonlinear-risk queries (VERDICT r4 #4).

The LSH/dedup family's 100 TB claim rests on plan shape (bucketed
shuffles, no all-pairs). This tool MEASURES it: it synthesizes an
sf1-equivalent documents/embeddings set (10x sf0.1 rows, same value
distributions — per-lang unigram frequencies, doc-length profile,
natural exact-dup rate, per-label Gaussian embeddings), runs the four
riskiest queries at both scale points, and reports wall-clock ratios.
A bucketed-linear plan should scale ~rows (ratio/10 near 1.0); an
accidental all-pairs plan would blow up ~quadratically (ratio/10 near
10).

Usage:  python tools/scalecurve.py [--mult 10] [--runs 3]
Writes SCALE_CURVE.json next to the repo root and prints a markdown
table ready for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
QUERIES = [
    "text_line_dedup",
    "dedup_minhash_banded",
    "dedup_embedding_blas",
    "sim_search_lsh",
    # round 5: the new document-heavy queries (token-stream / fingerprint)
    "text_bm25_topk",
    "text_ppl_buckets",
    "dedup_cross_source",
    # round 5c: bigram token stream, blocked co-occurrence graph, drift CDF
    "text_bigram_logprob",
    "graph_triangle_count",
    "drift_ks",
    # round 6: the audience-overlap self-join (VERDICT r5 item 7), the
    # range-partitioned global rank (fixed from an unpartitioned window),
    # and the cluster-blocked semantic dedup
    "events_user_overlap_jaccard",
    "ml_auc_roc",
    "dedup_semantic_cluster",
    # round 6b: warehouse heavies over the newly-tiled orders/lineitem,
    # plus the docs-based cascade funnel
    "warehouse_merge_resolve_conflicts",
    "warehouse_scd2_from_changelog",
    "layout_compaction_plan",
    "text_dedup_cascade",
    # round 7: the two ≥0.6 s round-6 headliners whose scale behavior was
    # asserted but unmeasured (VERDICT r6 item 2).  bom_rollup's part
    # table is tiled with disjoint p_partkey per tile (forest growth in
    # BREADTH — more roots, same bounded depth — the way a parts catalog
    # actually grows); pq_adc rides the synthesized 10x embeddings.
    "sim_search_pq_adc",
    "warehouse_bom_rollup",
    # round 8: the sequential-peel graph heavy (VERDICT r7 item 3) and
    # the xxhash64 minhash variant (VERDICT r7 item 4)
    "graph_kcore",
    "dedup_minhash_fast",
    "graph_bfs_hops",
]

# NOT measured here (same class as dedup_jaccard_prefix_filter below):
# dedup_lsh_recall_eval.  Its exact-truth leg's candidate volume is
# Σ_g df(g)² over shared shingles; this synthesizer reuses the base
# vocabulary verbatim, so at 10x every shingle's df grows 10x and truth
# candidates grow ~100x (measured 9.2x wall = the synthesizer's missing
# Heaps'-law vocabulary growth, not the operator).  The production
# operator it evaluates — dedup_minhash_banded — IS measured (2.21).

# NOT measured here: dedup_jaccard_prefix_filter.  Its candidate volume
# is sum_t df_prefix(t)^2 — governed by VOCABULARY GROWTH.  This
# synthesizer reuses the base vocabulary verbatim, so at 10x every
# token's df grows 10x and candidates grow ~100x: that measures the
# synthesizer's missing Heaps'-law growth, not the operator.  On real
# corpora the rare-token df distribution is near-stationary as the
# corpus grows (new vocabulary absorbs the tail) and candidates grow
# ~linearly; the production knobs when they don't are a prefix-df cap
# or hybrid banding (see the query docstring and SCALE.md §6e note).


def synthesize(out_dir: str, mult: int, seed: int = 7) -> tuple[int, int]:
    """Write documents.parquet / embeddings.parquet at ``mult`` x sf0.1
    cardinality into ``out_dir``, matching the base tables' value
    distributions; symlink the other eight tables to the sf0.1 files
    (load_tables opens all ten eagerly)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)

    # --- documents: per-lang unigram model fit on the base table -------
    base_docs = pq.read_table(os.path.join(BASE_SF, "documents.parquet")).to_pandas()
    by_lang: dict[str, tuple[list[str], np.ndarray]] = {}
    lang_counts = base_docs["lang"].value_counts()
    for lang, sub in base_docs.groupby("lang"):
        words: dict[str, int] = {}
        for t in sub["text"]:
            for w in t.split(" "):
                if w:
                    words[w] = words.get(w, 0) + 1
        vocab = sorted(words)
        freq = np.array([words[w] for w in vocab], dtype=float)
        by_lang[lang] = (vocab, freq / freq.sum())
    word_lens = base_docs["text"].str.split(" ").str.len().to_numpy()
    langs = lang_counts.index.to_numpy()
    lang_p = (lang_counts / lang_counts.sum()).to_numpy()
    n_sources = base_docs["source"].nunique()

    n_docs = len(base_docs) * mult
    dup_rate = 1.0 - base_docs["text"].nunique() / len(base_docs)
    texts: list[str] = []
    doc_lang: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < dup_rate:
            j = int(rng.integers(0, len(texts)))
            texts.append(texts[j])
            doc_lang.append(doc_lang[j])
            continue
        lang = str(rng.choice(langs, p=lang_p))
        vocab, p = by_lang[lang]
        n_words = int(rng.choice(word_lens))
        idx = rng.choice(len(vocab), size=n_words, p=p)
        toks = [vocab[k] for k in idx]
        # Heaps-law vocabulary growth (round 8): a stationary vocabulary
        # makes min-hash values concentrate as the corpus grows, so
        # band-bucket candidate pairs explode ~35x per 10x docs — an
        # artifact of the SYNTHESIZER, not of the banded plan (SCALE.md
        # 6g).  Real corpora keep minting types (V ∝ n^β); model that by
        # variant-suffixing ~8% of tokens from a pool that grows with
        # corpus position (earlier variants get reused, so df/bigram
        # stats stay plausible).
        novel = rng.random(n_words) < 0.08
        if novel.any():
            pool = 1 + i // 50
            for t_i in np.flatnonzero(novel):
                toks[t_i] = f"{toks[t_i]}~{int(rng.integers(0, pool))}"
        texts.append(" ".join(toks))
        doc_lang.append(lang)
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(doc_lang, pa.string()),
        "source": pa.array([f"src{int(i)}" for i in rng.integers(0, n_sources, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # --- embeddings: per-label Gaussian fit on the base table ----------
    base_emb = pq.read_table(os.path.join(BASE_SF, "embeddings.parquet")).to_pandas()
    mats = {
        int(lab): np.stack(sub["embedding"].to_numpy())
        for lab, sub in base_emb.groupby("label")
    }
    n_emb = len(base_emb) * mult
    labels = rng.integers(0, len(mats), n_emb)
    dim = next(iter(mats.values())).shape[1]
    out = np.empty((n_emb, dim), dtype=np.float32)
    for lab, m in mats.items():
        mask = labels == lab
        out[mask] = rng.normal(
            m.mean(axis=0), m.std(axis=0) + 1e-9, size=(int(mask.sum()), dim)
        ).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v for v in out.tolist()], pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    # --- events: tile the base table ``mult`` times with DISJOINT user
    # communities (user_id offset per tile) AND disjoint months (ts
    # offset per tile) — models fleet growth + accumulating history.
    # Both offsets matter: overlaying tiles on the SAME month would
    # multiply per-(type, time-bucket) user density by ``mult`` and blow
    # the co-occurrence pair count up quadratically — a property of the
    # synthesized graph, not of the blocked plan under test.
    base_ev = pq.read_table(os.path.join(BASE_SF, "events.parquet"))
    n_ev = base_ev.num_rows
    uid_span = 1 + int(pa.compute.max(base_ev["user_id"]).as_py())
    ts_type = base_ev.schema.field("ts").type
    ts_unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    month = 31 * 86400 * ts_unit_per_s
    tiles = []
    for k in range(mult):
        t = base_ev
        t = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pa.compute.add(t["event_id"], k * n_ev),
        )
        t = t.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pa.compute.add(t["user_id"], k * uid_span),
        )
        shifted = pa.compute.add(t["ts"].cast(pa.int64()), k * month).cast(ts_type)
        t = t.set_column(t.schema.get_field_index("ts"), "ts", shifted)
        tiles.append(t)
    pq.write_table(pa.concat_tables(tiles), os.path.join(out_dir, "events.parquet"))

    # --- orders + lineitem: tile with DISJOINT order keys (offset per
    # tile) — the warehouse CDC/SCD2/compaction queries window and join
    # on the order key, so disjoint tiles model key-space growth the way
    # disjoint users model fleet growth above.  Dates are left as-is:
    # per-key window population is what the plans are sensitive to.
    base_ord = pq.read_table(os.path.join(BASE_SF, "orders.parquet"))
    base_li = pq.read_table(os.path.join(BASE_SF, "lineitem.parquet"))
    okey_span = 1 + int(pa.compute.max(base_ord["o_orderkey"]).as_py())
    for name, tbl, keycol in (("orders", base_ord, "o_orderkey"),
                              ("lineitem", base_li, "l_orderkey")):
        parts = []
        for k in range(mult):
            t = tbl.set_column(
                tbl.schema.get_field_index(keycol),
                keycol,
                pa.compute.add(tbl[keycol], k * okey_span),
            )
            parts.append(t)
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(out_dir, f"{name}.parquet"))

    # --- part: tile with DISJOINT p_partkey — the BOM closure builds its
    # forest deterministically from the key space, so disjoint tiles grow
    # the forest in breadth (10x roots, same bounded depth), which is how
    # a real parts catalog scales.
    base_part = pq.read_table(os.path.join(BASE_SF, "part.parquet"))
    pkey_span = 1 + int(pa.compute.max(base_part["p_partkey"]).as_py())
    parts = []
    for k in range(mult):
        parts.append(base_part.set_column(
            base_part.schema.get_field_index("p_partkey"),
            "p_partkey",
            pa.compute.add(base_part["p_partkey"], k * pkey_span),
        ))
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "part.parquet"))

    # --- customer: tile with DISJOINT c_custkey (nationkey unchanged —
    # region membership is the group key the inequality/rank queries
    # aggregate by, and a real customer base grows within regions).
    base_cu = pq.read_table(os.path.join(BASE_SF, "customer.parquet"))
    ckey_span = 1 + int(pa.compute.max(base_cu["c_custkey"]).as_py())
    parts = []
    for k in range(mult):
        parts.append(base_cu.set_column(
            base_cu.schema.get_field_index("c_custkey"),
            "c_custkey",
            pa.compute.add(base_cu["c_custkey"], k * ckey_span),
        ))
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out_dir, "customer.parquet"))

    for t in ["region", "nation", "supplier"]:
        os.symlink(os.path.join(BASE_SF, f"{t}.parquet"),
                   os.path.join(out_dir, f"{t}.parquet"))
    return n_docs, n_emb


def measure_floor(spark, sf_dir: str, runs: int = 3) -> float:
    """Per-leg fixed-cost floor (VERDICT r7 item 5): the wall of a
    minimal one-stage plan on this leg's data (footer read + count of
    the 5-row region table).  Subtracting it from both legs nets out the
    session/job-launch cost that makes genuinely-linear sub-second plans
    read as >2x on the raw ratio."""
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    df.count()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.count()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 4)


def time_queries(spark, registry, sf_dir: str, runs: int, names=None) -> dict[str, float]:
    # Round-12 methodology fix (mirrors bench.py): each run times
    # BUILD + EXECUTE of a fresh plan, because iterative queries do
    # their loop work EAGERLY at plan construction (localCheckpoint) —
    # the old build-once form timed only the post-materialization count
    # and made peel-loop scale curves meaningless.
    timings = {}
    for name in names or QUERIES:
        registry[name](spark, sf_dir).count()  # warm-up (codegen, footers)
        spark.catalog.clearCache()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(min(samples), 4)
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", help="comma-separated query subset; results "
                    "MERGE into existing SCALE_CURVE.json rows by name")
    ap.add_argument("--data-dir", help="reuse an already-synthesized x-mult "
                    "dataset dir instead of synthesizing a fresh one")
    a = ap.parse_args()
    names = a.only.split(",") if a.only else list(QUERIES)

    import __spark_entry__ as entrymod
    from pulsar_ingestion_spark.session import get_spark

    spark = get_spark("scalecurve")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entrymod.queries()

    if a.data_dir:
        tmp, n_docs, n_emb = a.data_dir, None, None
    else:
        tmp = tempfile.mkdtemp(prefix="scalecurve-")
        n_docs, n_emb = synthesize(tmp, a.mult)
        print(f"synthesized {n_docs} docs / {n_emb} embeddings at {tmp}", file=sys.stderr)

    base = time_queries(spark, registry, BASE_SF, a.runs, names)
    big = time_queries(spark, registry, tmp, a.runs, names)
    floor_base = measure_floor(spark, BASE_SF, a.runs)
    floor_big = measure_floor(spark, tmp, a.runs)
    print(f"floors: base {floor_base}s, x{a.mult} {floor_big}s", file=sys.stderr)

    rows = []
    for name in names:
        ratio = big[name] / base[name] if base[name] else float("nan")
        # fixed-cost-adjusted ratio (VERDICT r7 item 5): net each leg's
        # empty-plan floor out before comparing; null when the base leg
        # is floor-dominated (adjusted base < 50 ms — the ratio would be
        # noise amplification, not signal)
        adj_base = base[name] - floor_base
        adj_big = max(big[name] - floor_big, 0.0)
        ratio_work = (
            round(adj_big / adj_base, 2) if adj_base >= 0.05 else None
        )
        rows.append({
            "query": name, "sf0.1_sec": base[name], f"x{a.mult}_sec": big[name],
            "ratio": round(ratio, 2), "ratio_per_x": round(ratio / a.mult, 2),
            "ratio_work": ratio_work,
        })
    print(json.dumps({"mult": a.mult, "rows": rows}))
    # the canonical curve file is the 10x one; other mults (e.g. the
    # round-9 mult=30 tail-linearity legs) get their own sidecar so a
    # three-point curve never clobbers the canonical two-point rows
    fname = "SCALE_CURVE.json" if a.mult == 10 else f"SCALE_CURVE_x{a.mult}.json"
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            fname)
    doc = {"mult": a.mult, "n_docs": n_docs, "n_emb": n_emb,
           "floor_base_sec": floor_base, f"floor_x{a.mult}_sec": floor_big,
           "rows": []}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        if prev.get("mult") == a.mult:
            doc = prev
            doc["floor_base_sec"] = floor_base
            doc[f"floor_x{a.mult}_sec"] = floor_big
    merged = {r["query"]: r for r in doc.get("rows", [])}
    merged.update({r["query"]: r for r in rows})
    doc["rows"] = [merged[q] for q in QUERIES if q in merged] + [
        r for q, r in merged.items() if q not in QUERIES
    ]
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    hdr = f"| query | sf0.1 (s) | {a.mult}x (s) | ratio | ratio/{a.mult} | ratio_work |"
    print(hdr + "\n|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| `{r['query']}` | {r['sf0.1_sec']} | {r[f'x{a.mult}_sec']} | "
              f"{r['ratio']} | {r['ratio_per_x']} | {r['ratio_work']} |", file=sys.stderr)


if __name__ == "__main__":
    main()
