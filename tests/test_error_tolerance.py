"""Poison-row tolerance: a corrupt image (bytes/shape mismatch) must not
fail the job; it surfaces in the error sink and its media spans simply
contribute nothing (K3 analogue, SURVEY.md §2.1)."""

from pyspark.sql import functions as F

from ocr_pytorch_spark import datagen
from ocr_pytorch_spark.operators import extract as EX


def test_corrupt_image_isolated(spark, bundled_weights, fixture_cfg):
    good = datagen.gen_images(["img-good-0001"])
    rows = [(r["media_ref"], r["height"], r["width"], r["channels"],
             bytearray(r["data"])) for r in good]
    # corrupt: declared 50x100x3 but only 10 bytes of data
    rows.append(("img-corrupt", 50, 100, 3, bytearray(b"0123456789")))
    imgs = spark.createDataFrame(
        rows, "media_ref string, height int, width int, channels int, "
              "data binary")
    docs = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0),
                 ("media", None, "img-corrupt", 1),
                 ("media", None, "img-good-0001", 2)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")

    spans = EX.explode_spans(docs)
    media = spans.where(F.col("kind") == "media").select(
        "doc_id", "src_offset", "media_ref")
    tr = EX.ocr_transcripts(imgs, media, EX.file_weights_spec(),
                            fixture_cfg).cache()

    errors = EX.ocr_errors(tr).collect()
    assert len(errors) == 1
    assert errors[0]["media_ref"] == "img-corrupt"
    assert "Error" in errors[0]["error"] or "error" in errors[0]["error"] \
        or "cannot" in errors[0]["error"]

    out = EX.extract(docs, imgs, EX.file_weights_spec(), fixture_cfg)
    spans_out = out.collect()[0]["spans"]
    # text span survives; corrupt media span contributes nothing;
    # good media span contributes its transcripts
    assert spans_out[0]["text"] == "hello"
    assert all(s["media_ref"] != "img-corrupt" for s in spans_out)
    tr.unpersist()
