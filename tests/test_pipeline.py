"""Layer-2/3 tests: the distributed Spark pipeline must reproduce the
single-process oracle's span sequence exactly (SURVEY.md §5.2)."""

import pytest

from ocr_pytorch_spark import datagen, oracle
from ocr_pytorch_spark.operators import extract as EX

N_DOCS = 16


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans]


@pytest.fixture(scope="module")
def fixture_tables(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture")
    doc_path, img_path = datagen.write_fixture(str(out), N_DOCS)
    return spark.read.parquet(doc_path), spark.read.parquet(img_path)


@pytest.fixture(scope="module")
def extracted(spark, fixture_tables, bundled_weights, fixture_cfg):
    docs_df, imgs_df = fixture_tables
    out = EX.extract(docs_df, imgs_df, EX.file_weights_spec(),
                     fixture_cfg)
    rows = {r["doc_id"]: _span_tuples(r["spans"]) for r in out.collect()}
    return rows


def test_spark_matches_oracle_span_sequences(extracted, bundled_weights,
                                             fixture_cfg):
    ctpn_w, crnn_w = bundled_weights
    docs = datagen.gen_documents(N_DOCS)
    assert len(extracted) == N_DOCS
    mismatches = []
    for d in docs:
        exp = oracle.extract_document(
            d, lambda r: datagen.gen_image_array(r)[0],
            ctpn_w, crnn_w, fixture_cfg)
        if extracted[d["doc_id"]] != _span_tuples(exp["spans"]):
            mismatches.append((d["doc_id"],
                               extracted[d["doc_id"]][:4],
                               _span_tuples(exp["spans"])[:4]))
    assert not mismatches, f"span mismatch: {mismatches[:2]}"


def test_extract_output_schema(extracted, fixture_tables):
    docs_df, _ = fixture_tables
    # same doc ids in and out, offsets consecutive from 0
    for doc_id, spans in extracted.items():
        assert [s[3] for s in spans] == list(range(len(spans)))
        assert all(s[0] == "text" for s in spans)


def test_extract_deterministic_rerun(spark, fixture_tables,
                                     bundled_weights, fixture_cfg,
                                     extracted):
    docs_df, imgs_df = fixture_tables
    out2 = EX.extract(docs_df, imgs_df, EX.file_weights_spec(),
                      fixture_cfg)
    rows2 = {r["doc_id"]: _span_tuples(r["spans"])
             for r in out2.collect()}
    assert rows2 == extracted
