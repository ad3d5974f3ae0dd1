"""Guardrails for the 100 TB plan shape (SURVEY.md §4): these assert the
structural properties the scaling argument in BENCH/BASELINE.md relies
on, so a refactor can't silently regress them."""

import pytest
from pyspark.sql import functions as F

from ocr_pytorch_spark import datagen
from ocr_pytorch_spark.config import PipelineConfig
from ocr_pytorch_spark.operators import extract as EX


@pytest.fixture(scope="module")
def hot_tables(spark, tmp_path_factory):
    """40 docs that all reference the SAME single image (max hot-key
    skew) plus one unique image each for a few docs."""
    docs = []
    for i in range(40):
        docs.append({
            "doc_id": f"doc-{i:04d}",
            "spans": [
                {"kind": "text", "text": f"t {i}", "media_ref": None,
                 "offset": 0},
                {"kind": "media", "text": None, "media_ref": "img-HOT",
                 "offset": 1},
            ],
        })
    refs = ["img-HOT"]
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("hot")
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    pq.write_table(pa.table({
        "doc_id": [d["doc_id"] for d in docs],
        "spans": pa.array([[(s["kind"], s["text"], s["media_ref"],
                             s["offset"]) for s in d["spans"]]
                           for d in docs], pa.list_(span_t))}),
        str(out / "documents.parquet"))
    imgs = datagen.gen_images(refs)
    pq.write_table(pa.table({
        "media_ref": [r["media_ref"] for r in imgs],
        "height": pa.array([r["height"] for r in imgs], pa.int32()),
        "width": pa.array([r["width"] for r in imgs], pa.int32()),
        "channels": pa.array([3] * len(imgs), pa.int32()),
        "data": pa.array([r["data"] for r in imgs], pa.binary())}),
        str(out / "images.parquet"))
    return (spark.read.parquet(str(out / "documents.parquet")),
            spark.read.parquet(str(out / "images.parquet")))


def test_hot_image_ocr_runs_once(spark, hot_tables, bundled_weights,
                                 fixture_cfg):
    """An image referenced by 40 docs is OCR'd exactly once: the
    transcripts table has one row set per DISTINCT media_ref, and the
    fan-out to 40 docs happens in the (tiny-row) join."""
    docs_df, imgs_df = hot_tables
    spans = EX.explode_spans(docs_df)
    media = spans.where(F.col("kind") == "media").select(
        "doc_id", "src_offset", "media_ref")
    tr = EX.ocr_transcripts(imgs_df, media, EX.file_weights_spec(),
                            fixture_cfg)
    rows = tr.collect()
    # exactly one transcript set for the single distinct ref — if the
    # OCR ran per document we'd see 40x duplicates here
    assert len(rows) == len({r["box_order"] for r in rows})
    assert {r["media_ref"] for r in rows} == {"img-HOT"}

    # and the full pipeline replicates it to every doc identically
    out = EX.extract(docs_df, imgs_df, EX.file_weights_spec(),
                     fixture_cfg)
    per_doc = [tuple((s["text"], s["media_ref"]) for s in r["spans"][1:])
               for r in out.collect()]
    assert len(set(per_doc)) == 1 and len(per_doc) == 40


def test_plan_semi_join_keeps_image_bytes_unshuffled(spark, hot_tables,
                                                     fixture_cfg):
    """The needed-refs filter on the images table must be a (broadcast)
    LEFT SEMI join — image bytes never join doc rows directly."""
    docs_df, imgs_df = hot_tables
    spans = EX.explode_spans(docs_df)
    media = spans.where(F.col("kind") == "media").select(
        "doc_id", "src_offset", "media_ref")
    tr = EX.ocr_transcripts(imgs_df, media, EX.file_weights_spec(),
                            fixture_cfg)
    plan = _plan_of(tr)
    assert "LeftSemi" in plan


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_transcript_schema_has_no_pixels(spark, hot_tables, fixture_cfg):
    """Everything downstream of the OCR UDF carries only transcript
    columns — the binary image data cannot reach the reassembly
    shuffles because the UDF output schema excludes it."""
    docs_df, imgs_df = hot_tables
    spans = EX.explode_spans(docs_df)
    media = spans.where(F.col("kind") == "media").select(
        "doc_id", "src_offset", "media_ref")
    tr = EX.ocr_transcripts(imgs_df, media, EX.file_weights_spec(),
                            fixture_cfg)
    assert set(tr.columns) == {"media_ref", "box_order", "text"}
    out = EX.extract(docs_df, imgs_df, EX.file_weights_spec(),
                     fixture_cfg)
    assert set(out.columns) == {"doc_id", "spans"}

def test_embedding_family_plans_are_array_native(spark):
    """r2 guardrail: the embedding dedup/ANN plans must not explode
    vectors to per-component rows (the r1 scale-killer) — no
    posexplode/Generate over the embedding column — and the bounded
    query side must broadcast."""
    from ocr_pytorch_spark.operators import dedup as D
    from ocr_pytorch_spark.operators import similarity as S
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")

    neardup_plan = D.embedding_neardup_pairs(emb) \
        ._jdf.queryExecution().executedPlan().toString()
    topk_plan = S.cosine_topk(emb) \
        ._jdf.queryExecution().executedPlan().toString()
    lsh_plan = S.lsh_cosine_topk(emb) \
        ._jdf.queryExecution().executedPlan().toString()

    for name, plan in [("neardup", neardup_plan), ("topk", topk_plan),
                       ("lsh_topk", lsh_plan)]:
        # Generate nodes exist only for the skinny band-key explode
        # (ints), never for the embedding/vec array itself
        for line in plan.splitlines():
            if "Generate explode" in line or "posexplode" in line:
                # the vector columns are embedding#N / vec#N; the only
                # legal explodes are over skinny band/probe-key arrays
                assert "vec#" not in line and "embedding#" not in line, \
                    f"{name}: vector exploded to component rows: {line}"
    # the bounded query set broadcasts in both top-k plans
    assert "BroadcastExchange" in topk_plan
    assert "BroadcastExchange" in lsh_plan


def test_html_extraction_plans_stay_jvm_side(spark):
    """r3 guardrail: the HTML strip/main-block/layout queries are pure
    codegen — no Python UDF stage (BatchEvalPython/ArrowEvalPython/
    mapInPandas) may appear; the strip chain must live inside
    whole-stage codegen."""
    from ocr_pytorch_spark.operators import html as H
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    for name, df in [("strip", H.html_strip(docs)),
                     ("main_block", H.html_main_block(docs)),
                     ("layout", H.layout_reading_order(docs))]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython",
                    "FlatMapGroupsInPandas", "MapInPandas"):
            assert bad not in plan, f"{name}: python stage: {bad}"
        # executedPlan().toString() marks codegen stages with '*(n)';
        # AQE-wrapped plans show the markers only after finalization,
        # so accept either — the python-stage absence above is the
        # load-bearing check
        assert "*(" in plan or "AdaptiveSparkPlan" in plan, name
    # layout is one explode + one window + one agg: a single shuffle
    # per window/agg step, never a join
    layout_plan = H.layout_reading_order(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in layout_plan


def test_minhash_pair_generation_single_lineage(spark):
    """r2 guardrail: MinHash candidate pairs come from ONE groupBy +
    in-bucket expansion — the signature aggregation appears once in
    the plan (a band self-join would scan/aggregate twice)."""
    from ocr_pytorch_spark.operators import dedup as D
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = D.minhash_lsh_pairs(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    # one scan of the documents table, not two
    assert plan.count("documents.parquet") == 1


def test_r7_operator_plan_shapes(spark):
    """Lock in the round-7 operators' scale-critical plan shapes:
    dsir's top-k is TakeOrderedAndProject (never a full sort) with the
    bucket-weight table broadcast; the corpus-overlap pair matrix's
    only nested-loop join is over tiny per-corpus signatures; the AUC
    window runs single-partition only ABOVE the bounded score
    histogram; dataset_split and robots_filter stay exchange-free
    map-side (robots: fully fused into the scan)."""
    from tests.conftest import SF_SMALL

    import __spark_entry__ as E

    qs = E.queries()

    dsir = _plan_of(qs["dsir_topk"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in dsir
    assert "BroadcastHashJoin" in dsir
    assert "CartesianProduct" not in dsir

    ovl = _plan_of(qs["corpus_overlap_minhash"](spark, SF_SMALL))
    # the a<b pair matrix joins the 20-row signature aggregates — a
    # nested-loop over aggregates is fine; over raw grams it is not
    assert "BroadcastNestedLoopJoin" in ovl
    n_aggs = sum(ovl.count(a) for a in
                 ("HashAggregate", "SortAggregate",
                  "ObjectHashAggregate"))
    assert n_aggs >= 2  # partial+final signature aggregates

    auc = _plan_of(qs["classifier_auc"](spark, SF_SMALL))
    i_single = auc.find("SinglePartition")
    assert i_single != -1
    # the histogram aggregate appears before (below) the single-
    # partition exchange in the formatted tree's operator list
    assert "HashAggregate" in auc[:auc.find("Arguments: SinglePartition")] \
        or auc.count("HashAggregate") >= 2

    import re as _re

    split = _plan_of(qs["dataset_split"](spark, SF_SMALL))
    # exactly one exchange NODE (the rollup shuffle); the formatted
    # dump names each node twice (tree + detail), so count node ids
    assert len(_re.findall(r"^\(\d+\) Exchange", split,
                           _re.MULTILINE)) == 1

    robots = _plan_of(qs["robots_filter"](spark, SF_SMALL))
    assert "Exchange" not in robots  # pure map-side, fused into scan
    assert "* Project" in robots  # '*' = whole-stage-codegen marker
