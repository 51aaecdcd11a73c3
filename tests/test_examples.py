"""End-to-end example-model acceptance tests with the reference's golden
expectations (SURVEY §5: ``tests/test_examples.py:37-135``)."""

import io
import json
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
sys.path.insert(0, os.path.dirname(EXAMPLES))

from examples.favourite_colours import FavouriteColours  # noqa: E402
from examples.manifest_mapper import AustralianAnimals  # noqa: E402
from examples.noaa_extremes import NoaaExtremes  # noqa: E402
from examples.poisonous_animals import PoisonousAnimals  # noqa: E402

DATA = os.path.join(EXAMPLES, "data")


def test_poisonous_animals_grouping(spark, resolver):
    """Golden log line from the reference (test_examples.py:51-53)."""
    log = io.StringIO()
    with resolver.context(data_path=DATA):
        m = PoisonousAnimals()
        m.set_logger(log)
        m.log_to_stdout = False
        assert m.go(spark)
    logs = log.getvalue()
    assert (
        "In Australia you could find Blue ringed octopus,Box jellyfish,Eastern brown snake"
        in logs
    )


def test_favourite_colours_summary(spark, resolver, tmp_path):
    """Golden summary values from the reference (test_examples.py:69-74):
    Blue liked 2020-01-01..2020-02-15 → January 31, February 14."""
    with resolver.context(data_path=DATA, output_path=str(tmp_path)):
        m = FavouriteColours()
        m.log_to_stdout = False
        assert m.go(spark)
    out = json.load(open(tmp_path / "favourite_colours_summary.json"))
    assert out["Blue"]["January"] == 31
    assert out["Blue"]["February"] == 14
    assert out["Red"]["February"] == 9
    assert out["Red"]["March"] == 8


def test_favourite_colours_bad_data_checks(spark, resolver, tmp_path):
    """Pre-check rejects multi-year input; post-check catches the swapped
    start/end conservation failure (test_examples.py:76-115)."""
    log = io.StringIO()
    with resolver.context(data_path=DATA, output_path=str(tmp_path)):
        m = FavouriteColours()
        m.log_to_stdout = False
        m.set_logger(log)
        m.favourite_colours = type(m).favourite_colours.clone(
            engine_url="csv://{data_path}/favourite_colours_bad_data.csv"
        )
        assert m.pre_build_check() is False
        assert "only designed to work with data from a single year" in log.getvalue()

        # single-year variant of the bad data: swapped pair only
        swapped = tmp_path / "swapped.csv"
        swapped.write_text(
            "name,colour,start,end\n"
            "Spiderman,Blue,2020-02-15,2020-01-01\n"
            "Superman,Red,2020-02-01,2020-02-10\n"
        )
        m2 = FavouriteColours()
        m2.log_to_stdout = False
        m2.set_logger(log)
        m2.favourite_colours = type(m2).favourite_colours.clone(
            engine_url=f"csv://{swapped}"
        )
        m2.set_spark(spark)
        assert m2.pre_build_check() is True
        m2.build()
        assert m2.post_build_check() is False
        assert "Total days in input doesn't match total days in output" in log.getvalue()


def test_australian_animals_manifest_fanout(spark, resolver, tmp_path):
    """Golden per-file outputs (test_examples.py:117-135): poisonous output
    has Box jellyfish but not Arizona Bark Scorpion."""
    with resolver.context(input_path=DATA, output_path=str(tmp_path)):
        m = AustralianAnimals()
        m.log_to_stdout = False
        assert m.go(spark)

    poisonous = (tmp_path / "australian_poisonous_animals.json").read_text()
    assert "Box jellyfish" in poisonous
    assert "Arizona Bark Scorpion" not in poisonous
    aquatic = (tmp_path / "australian_aquatic_animals.json").read_text()
    assert "Australian giant cuttlefish" in aquatic
    assert "Gharial" not in aquatic


def test_noaa_extremes(spark, resolver):
    """Hottest/coldest from the GHCN-D-shaped fixture (headerless gz csv)."""
    log = io.StringIO()
    with resolver.context(data_path=DATA):
        m = NoaaExtremes()
        m.set_logger(log)
        m.log_to_stdout = False
        assert m.go(spark)
    assert m.hottest["v"] == 31.2
    assert m.hottest["ID"] == "STATION0001"
    assert m.coldest["v"] == -27.7
    assert m.stats["measurements"] == 5
    assert "Hottest: 31.2C at STATION0001" in log.getvalue()


def test_media_dedup_pipeline(spark, resolver, tmp_path):
    """Multimodal end-to-end: two byte-identical files dedupe, the
    distinct one survives (feature cosine == 1.0 for identical bytes)."""
    from examples.media_pipeline import MediaDedupPipeline

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.png").write_bytes(b"\x89PNG identical payload bytes 123")
    (media / "b.png").write_bytes(b"\x89PNG identical payload bytes 123")
    (media / "c.png").write_bytes(b"\x89PNG totally different bytes!!")

    with resolver.context(media_path=str(media), output_path=str(tmp_path)):
        m = MediaDedupPipeline()
        m.log_to_stdout = False
        assert m.go(spark)

    import json

    doc = json.load(open(tmp_path / "media_keep_manifest.json"))
    assert doc["n_kept"] == 2
    assert doc["n_dropped"] == 1
    kept_names = {p.rsplit("/", 1)[-1] for p in doc["kept"]}
    assert "c.png" in kept_names
    assert {"a.png", "b.png"} & kept_names  # exactly one of the twins


def test_manifest_single_pass_variant(spark, resolver, tmp_path):
    """The scale path of the manifest fan-out: ONE multi-path read +
    partitioned write instead of a per-file driver loop."""
    with resolver.context(input_path=DATA, output_path=str(tmp_path)):
        m = AustralianAnimals()
        m.log_to_stdout = False
        m.set_spark(spark)
        out_dir = str(tmp_path / "single_pass")
        m.build_single_pass(out_dir)

    result = spark.read.json(out_dir)
    assert set(r["where"] for r in result.collect()) == {"Australia"}
    assert result.where(result.source_file == "poisonous_animals.json").count() == 3
    assert result.where(result.source_file == "aquatic_animals.json").count() == 1


def test_training_corpus_pipeline(spark, resolver, tmp_path):
    from examples.training_corpus import TrainingCorpusPipeline

    with resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        output_path=str(tmp_path),
    ):
        model = TrainingCorpusPipeline()
        assert model.go(), "model run (incl. post_build_check) must succeed"

    import json

    funnel = json.loads((tmp_path / "corpus_funnel.json").read_text())
    # monotone funnel: every stage only removes documents
    assert (funnel["input"] >= funnel["after_source_filter"]
            >= funnel["after_gopher_rules"]
            >= funnel["after_span_trim"] >= funnel["after_dedup"]
            >= funnel["after_decontamination"] >= funnel["after_rebalance"]
            >= funnel["after_token_budget"] > 0)
    assert funnel["total_tokens"] <= TrainingCorpusPipeline.corpus_budget

    packed = spark.read.parquet(str(tmp_path / "packed_corpus.parquet"))
    assert packed.count() == funnel["after_token_budget"]

    # the WebDataset export covers every budgeted train doc
    assert funnel["n_wds_docs"] == funnel["after_token_budget"]
    assert funnel["n_wds_shards"] > 0
    wds_files = list((tmp_path / "wds_shards").glob("shard-*.tar"))
    assert len(wds_files) == funnel["n_wds_shards"]
    assert funnel["n_packs"] >= 1
    # terminal shards: id streams + EOS boundaries over the same docs
    shards = spark.read.parquet(str(tmp_path / "token_shards.parquet"))
    srows = shards.collect()
    assert len(srows) == funnel["n_shards"] >= 1
    assert sum(r["n_tokens"] for r in srows) == funnel["shard_tokens"]
    eos_total = sum(r["token_ids"].count(4096) for r in srows)
    assert eos_total == funnel["after_token_budget"]  # one EOS per doc
    for r in srows:
        assert len(r["doc_starts"]) == r["n_docs"]
        assert r["doc_starts"][0] == 0 and r["token_ids"][-1] == 4096
    # epoch order: every pack got exactly one position in 1..n_packs
    pos = sorted(r["epoch_pos"] for r in
                 packed.select("pack_id", "epoch_pos").distinct().collect())
    assert pos == list(range(1, funnel["n_packs"] + 1))
    # deterministic: a second run produces the identical doc set
    with resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        output_path=str(tmp_path / "run2"),
    ):
        assert TrainingCorpusPipeline().go()
    packed2 = spark.read.parquet(str(tmp_path / "run2" / "packed_corpus.parquet"))
    assert sorted(r["doc_id"] for r in packed2.collect()) == \
        sorted(r["doc_id"] for r in packed.collect())


def test_incremental_ingest(spark, resolver, tmp_path):
    from examples.incremental_ingest import IncrementalIngest

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "a settled corpus document that stays where it is")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(10, base + " extra"),   # near-dups corpus doc 1 -> rejected
         (11, "genuinely new content with its own words and nothing shared"),
         (12, "another new document and one of an in-batch duplicate pair"),
         (13, "another new document and one of an in-batch duplicate pair yy")],
        ["doc_id", "text"],
    )
    corpus.write.parquet(f"{tmp_path}/corpus")
    batch.write.parquet(f"{tmp_path}/batch")

    with resolver.context(
        corpus_path=f"{tmp_path}/corpus",
        batch_path=f"{tmp_path}/batch",
        output_path=str(tmp_path),
    ):
        model = IncrementalIngest()
        assert model.go()

    accepted = spark.read.parquet(f"{tmp_path}/accepted.parquet")
    assert sorted(r["doc_id"] for r in accepted.collect()) == [11, 12]
    import json

    report = json.load(open(f"{tmp_path}/ingest_report.json"))
    assert report == {"batch_size": 4, "accepted": 2, "rejected_near_dup": 2}
    # partitioned append layout: one directory per predicted language
    assert any(p.name.startswith("lang=") for p in (tmp_path / "accepted.parquet").iterdir())


def test_ann_index_lifecycle(spark, resolver, tmp_path):
    from pyspark.sql import functions as F

    from examples.ann_index import BuildAnnIndex, QueryAnnIndex, pipeline

    with resolver.context(
        emb_path="/root/testdata/sf0.001/embeddings.parquet",
        index_path=str(tmp_path),
    ):
        coll = pipeline()
        # run order must place the index build before the query model
        order = [cls.__name__ for layer in coll.run_order() for cls in layer]
        assert order.index("BuildAnnIndex") < order.index("QueryAnnIndex")
        coll.run(spark)

    cells = spark.read.parquet(f"{tmp_path}/cells.parquet")
    assert cells.where(F.col("centroid_id").isNull()).count() == 0
    out = spark.read.parquet(f"{tmp_path}/neighbors.parquet")
    assert out.groupBy("query_id").count().where(F.col("count") > 5).count() == 0
    assert out.select("query_id").distinct().count() == 10
    # served results must equal the direct in-memory IVF answer
    from ayeaye_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.where(F.col("vec_id") % 50 == 0)
    fresh_cells = similarity.assign_cells_vectorized(emb, centroids)
    want = similarity.ivf_topk_from_cells(
        fresh_cells, fresh_cells.where(F.col("vec_id") < 10), k=5
    )
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    expected = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want.collect()}
    assert got == expected


def test_rest_ingest_incremental(spark, resolver, tmp_path):
    """The REST-stream example drains pages into ORC resumably: a second
    run against the same checkpoint (with a higher page budget) ingests
    only the new pages."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from examples.rest_ingest import RestIngest

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            page = int(self.path.split("/")[-1])
            body = _json.dumps(
                [{"id": page * 2 + i, "name": f"p{page}r{i}"} for i in range(2)]
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    api = f"http://127.0.0.1:{server.server_port}/page/{{page}}"
    try:
        with resolver.context(out_path=str(tmp_path), api_url=api):
            m = RestIngest()
            m.go()
            assert m.stats["rows_ingested"] == 6  # pages 0-2 x 2 rows

            m2 = RestIngest()
            m2.pages = 5  # budget raised: only pages 3-4 are new
            m2.go()
            assert m2.stats["rows_ingested"] == 10
        ids = sorted(
            r["id"] for r in spark.read.orc(str(tmp_path / "rest_rows")).collect()
        )
        assert ids == list(range(10))  # no re-ingestion of pages 0-2
    finally:
        server.shutdown()


def test_pq_index_lifecycle(spark, resolver, tmp_path):
    """Persisted IVF-PQ codes serve the same top-k as the in-memory
    build+search composition — the index survives the round trip."""
    from pyspark.sql import functions as F

    from examples.ann_index import BuildPqIndex, QueryPqIndex
    from ayeaye_spark.operators import similarity

    with resolver.context(
        emb_path="/root/testdata/sf0.001/embeddings.parquet",
        index_path=str(tmp_path),
    ):
        assert BuildPqIndex().go()
        assert QueryPqIndex().go()

    out = spark.read.parquet(f"{tmp_path}/pq_neighbors.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = similarity.ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 10),
        coarse=emb.where("vec_id % 50 = 0"),
        codebook=emb.where(F.col("vec_id") < 16),
    )
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    expected = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want.collect()}
    assert got == expected and len(got) == 50


def test_daily_analytics_report(spark, resolver, tmp_path):
    from examples.analytics_report import DailyAnalyticsReport

    with resolver.context(
        events_path="/root/testdata/sf0.001/events.parquet",
        output_path=str(tmp_path),
    ):
        assert DailyAnalyticsReport().go()

    import json

    rep = json.loads((tmp_path / "analytics_report.json").read_text())
    f = rep["funnel"]
    assert f["view"] >= f["view_click"] >= f["view_click_buy"] >= 0
    assert len(rep["top_paths"]) == 5
    assert rep["kanonymity"]["n_cells"] > 0
    daily = spark.read.parquet(str(tmp_path / "daily_metrics.parquet"))
    assert daily.count() == rep["days"]
    # reproducible bit-for-bit
    with resolver.context(
        events_path="/root/testdata/sf0.001/events.parquet",
        output_path=str(tmp_path / "run2"),
    ):
        assert DailyAnalyticsReport().go()
    rep2 = json.loads((tmp_path / "run2" / "analytics_report.json").read_text())
    assert rep2 == rep


def test_perceptual_media_dedup(spark, resolver, tmp_path):
    """Content-level dedup: a one-pixel-edited BMP pairs with its
    original by dHash; a structurally different image survives."""
    import numpy as np

    from examples.media_pipeline import PerceptualMediaDedup
    from tests.test_operators import TestImageNearDup

    base = TestImageNearDup._gradient(seed=1)
    edited = base.copy()
    edited[0, 0] = [255, 255, 255]
    other = TestImageNearDup._gradient(seed=2)[:, ::-1]

    media = tmp_path / "media"
    media.mkdir()
    (media / "orig.bmp").write_bytes(TestImageNearDup._bmp(base))
    (media / "resave.bmp").write_bytes(TestImageNearDup._bmp(edited))
    (media / "other.bmp").write_bytes(TestImageNearDup._bmp(other))

    with resolver.context(media_path=str(media), output_path=str(tmp_path)):
        m = PerceptualMediaDedup()
        m.log_to_stdout = False
        assert m.go(spark)

    import json

    doc = json.load(open(tmp_path / "media_phash_manifest.json"))
    kept = {p.rsplit("/", 1)[-1] for p in doc["kept"]}
    assert doc["n_dropped"] == 1
    assert "other.bmp" in kept
    assert "orig.bmp" in kept and "resave.bmp" not in kept


def test_tensor_export_pipeline(spark, resolver, tmp_path):
    """Resize stage end to end: the committed media fixture exports 5
    fixed-shape RGB tensors (the four WAVs and two AVIs route out as
    not-an-image), and the cross-format PNG/BMP pair yields
    byte-identical tensors."""
    from ayeaye_spark.fixtures.media import ensure_media_fixture
    from ayeaye_spark.sources.webdataset import read_tar_shards
    from examples.media_pipeline import TensorExportPipeline

    with resolver.context(
        media_path=ensure_media_fixture(), output_path=str(tmp_path)
    ):
        m = TensorExportPipeline()
        m.log_to_stdout = False
        assert m.go(spark)

    import json

    doc = json.load(open(tmp_path / "media_tensor_manifest.json"))
    assert doc["n_tensors"] == 5 and doc["n_skipped"] == 6
    assert doc["tensor_bytes"] == 32 * 32 * 3
    members = {
        (r["key"], r["suffix"]): bytes(r["content"])
        for r in read_tar_shards(
            spark, str(tmp_path / "tensor_shards") + "/shard-*.tar"
        ).collect()
    }
    assert len(members) == 5
    for (_, suffix), data in members.items():
        assert suffix == "rgb" and len(data) == 32 * 32 * 3
    assert members[("gradient.png", "rgb")] == members[("gradient.bmp", "rgb")]


def test_audio_video_curation(spark, resolver, tmp_path):
    """Audio gate + keyframe plan end to end over the committed media
    fixture: the clipped and mostly-silent WAVs drop, the tone and
    mu-law chirp keep; scenes.avi plans frame 0 plus the two hard
    cuts, clip.avi (all-motion) plans every frame."""
    from ayeaye_spark.fixtures.media import ensure_media_fixture
    from examples.media_pipeline import AudioVideoCuration

    with resolver.context(
        media_path=ensure_media_fixture(), output_path=str(tmp_path)
    ):
        m = AudioVideoCuration()
        m.log_to_stdout = False
        assert m.go(spark)

    import json

    doc = json.load(open(tmp_path / "media_av_manifest.json"))
    assert doc["kept_audio"] == ["chirp_mulaw.wav", "tone.wav"]
    assert doc["dropped_audio"] == {
        "clipped.wav": "clipped", "quiet.wav": "mostly_silent"
    }
    assert doc["keyframe_plan"] == {
        "clip.avi": [0, 1, 2], "scenes.avi": [0, 2, 4]
    }


def test_tokenizer_report(spark, resolver, tmp_path):
    from examples.tokenizer_report import TokenizerReport

    with resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        output_path=str(tmp_path),
    ):
        assert TokenizerReport().go(), "model run must succeed"

    import json

    report = json.loads((tmp_path / "tokenizer_report.json").read_text())
    cov = {c["pct"]: c for c in report["coverage"]}
    assert set(cov) == {50, 90, 99}
    # monotone curve: higher coverage needs a no-smaller vocab
    assert cov[50]["vocab_size"] <= cov[90]["vocab_size"] <= cov[99]["vocab_size"]
    assert all(c["covered"] <= c["total"] for c in cov.values())
    # merges are learned in non-increasing count order
    counts = [m["count"] for m in report["merges"]]
    assert counts == sorted(counts, reverse=True) and len(counts) >= 1
    coh = spark.read.parquet(str(tmp_path / "doc_coherence.parquet"))
    assert coh.count() == report["n_docs"] > 0


def test_embedding_curation(spark, resolver, tmp_path):
    from examples.embedding_curation import EmbeddingCuration

    with resolver.context(
        emb_path="/root/testdata/sf0.001/embeddings.parquet",
        output_path=str(tmp_path),
    ):
        assert EmbeddingCuration().go(), "model run must succeed"

    import json

    report = json.loads((tmp_path / "embedding_curation.json").read_text())
    assert 0 < report["survivors"] <= report["input_vectors"]
    assert report["semantic_duplicates_removed"] >= 0
    negs = spark.read.parquet(str(tmp_path / "hard_negatives.parquet"))
    rows = negs.collect()
    assert len(rows) == report["hard_negatives"] > 0
    assert all(r["neighbor_label"] != r["query_label"] for r in rows)
    surv = spark.read.parquet(str(tmp_path / "embedding_survivors.parquet"))
    assert surv.count() == report["survivors"]


def test_corpus_audit(spark, resolver, tmp_path):
    from examples.corpus_audit import CorpusAudit

    with resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        output_path=str(tmp_path),
    ):
        assert CorpusAudit().go(), "model run must succeed"

    import json

    report = json.loads((tmp_path / "corpus_audit.json").read_text())
    assert report["n_docs"] == 500
    ha = report["hash_audit"]
    assert ha["distinct_tokens"] > 0
    # both keyspaces are collision-free at 500 docs
    assert ha["portable_collisions"] == 0 and ha["fast_collisions"] == 0
    assert ha["recommended_hash_mode"] == "portable"
    # cluster histogram covers the whole corpus
    assert sum(h["size"] * h["clusters"] for h in report["cluster_histogram"]) == 500
    assert 0 <= report["exact_dup_rate_ppm"] < 1_000_000
    assert {r["lang"] for r in report["quality_shift_by_lang"]}
    assert all(p["docs"] > 0 for p in report["pii_by_source"])
    dv = report["diversity"]
    assert 0 < dv["min_ppm"] <= dv["mean_ppm"] <= 1_000_000
    assert len(dv["most_repetitive"]) == 5
    div = spark.read.parquet(str(tmp_path / "doc_diversity.parquet"))
    assert div.count() == 500


def test_hybrid_search(spark, resolver, tmp_path):
    from examples.hybrid_search import HybridSearch

    with resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        emb_path="/root/testdata/sf0.001/embeddings.parquet",
        output_path=str(tmp_path),
    ):
        assert HybridSearch().go(), "model run must succeed"

    import json

    report = json.loads((tmp_path / "hybrid_search.json").read_text())
    out = spark.read.parquet(str(tmp_path / "hybrid_results.parquet"))
    rows = out.collect()
    assert len(rows) == report["results"] > 0
    assert report["in_both_rankers"] >= 0
    # fused ordering is deterministic and dense
    got = sorted((r["rank"], r["doc_id"]) for r in rows)
    assert [rk for rk, _ in got] == list(range(1, len(rows) + 1))
    # every result carries its enrichment columns
    assert all(r["snippet"] is not None and r["lang"] is not None for r in rows)
    # and matches the catalog's fused top-10 on (doc_id, rank)
    from ayeaye_spark.catalog import QUERIES

    cat = {(r["doc_id"], r["rank"])
           for r in QUERIES["docs_hybrid_rrf"](
               spark, "/root/testdata/sf0.001").collect()}
    assert {(r["doc_id"], r["rank"]) for r in rows} == cat


def test_crawl_ingest(spark, resolver, tmp_path):
    """Golden run over the COMMITTED crawl fixture: the funnel numbers
    are pinned by the fixture's construction (14 HTTP 200 text pages
    incl. 2 robots files -> 12 pages, 2 disallowed -> 10 allowed, 3
    URL-variant collapses -> 7 canonical survivors)."""
    import json

    from examples.crawl_ingest import CrawlIngest
    from ayeaye_spark.fixtures import ensure_crawl_fixture
    from ayeaye_spark.sources.webdataset import read_tar_shards

    with resolver.context(
        archive_path=ensure_crawl_fixture(),
        output_path=str(tmp_path),
    ):
        assert CrawlIngest().go(), "model run must succeed"

    report = json.loads((tmp_path / "crawl_ingest.json").read_text())
    assert report["n_http_pages"] == 12
    assert report["n_robots_allowed"] == 10
    assert report["n_canonical_survivors"] == 7
    assert report["shard_keys"] == 7
    out = spark.read.parquet(str(tmp_path / "crawl_corpus.parquet"))
    rows = {r["canonical_url"]: r for r in out.collect()}
    assert len(rows) == 7
    assert rows["https://www.alpha-site.com/home"]["dup_count"] == 2
    assert "Alpha & Home" in rows["https://www.alpha-site.com/home"]["text"]
    assert not any("secret" in c or "/b/9" in c for c in rows)
    # shards hold exactly the survivors' extracted text
    members = read_tar_shards(spark, f"{tmp_path}/shards/shard-*.tar")
    got = {r["key"]: bytes(r["content"]).decode() for r in members.collect()}
    assert len(got) == 7
    assert got[rows["https://www.alpha-site.com/home"]["keep_url"]].startswith(
        "Alpha & Home"
    )


def test_web_corpus(spark, resolver, tmp_path):
    from pyspark.sql import functions as F

    from examples.web_corpus import WebCorpus

    with resolver.context(
        docs_path="/root/testdata/sf0.001/documents.parquet",
        output_path=str(tmp_path),
    ):
        assert WebCorpus().go(), "model run must succeed"

    import json

    report = json.loads((tmp_path / "web_corpus.json").read_text())
    f = report["funnel"]
    # every stage removed something on this fixture: URL variants
    # (doc_id%7==3), nav pages (%17==2), mojibake (%11==5), noai (%13==7)
    assert f["pages"] == 500
    # robots gate: sources src0/src5/src10/src15 disallow /page/
    assert f["pages"] > f["after_robots_gate"]
    assert f["after_robots_gate"] > f["after_url_dedup"]
    assert f["after_url_dedup"] > f["after_boilerplate_gates"]
    assert f["after_boilerplate_gates"] > f["after_encoding_hygiene"]
    assert f["after_encoding_hygiene"] > f["curated"] > 0
    out = spark.read.parquet(str(tmp_path / "web_curated.parquet"))
    assert out.count() == f["curated"]
    # curated text passed extraction: no markup survives
    assert out.where(F.col("text").rlike("<[A-Za-z!/]")).count() == 0
    # opt-out docs are gone from the curated text
    assert out.where(F.col("text").contains("noai")).count() == 0
    # authority report covers the link graph
    assert report["link_graph_domains"] > 0
    assert len(report["top_domains_by_authority"]) == 5
    prs = [d["pr_ppb"] for d in report["top_domains_by_authority"]]
    assert prs == sorted(prs, reverse=True) and prs[0] > 0
    assert report["opt_out_sources"], "fixture injects noai marks"
