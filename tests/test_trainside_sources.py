"""Train-side scans (S4/S5/S6): reference dataset formats as Spark
sources, against hand-built sample files."""

import pytest

from ocr_pytorch_spark.sources import trainside as TS


@pytest.fixture(scope="module")
def sample_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trainside")
    (d / "infofile.txt").write_text(
        "images/a.jpg\thello world\nimages/b.jpg\t42 街\n")
    (d / "gt_img1.txt").write_text(
        "10,20,100,22,101,52,11,50,SOME TEXT\n"
        "200,10,230,10,230,40,200,40\n")
    (d / "ann.xml").write_text(
        "<annotation><object><bndbox><xmin>5</xmin><ymin>6</ymin>"
        "<xmax>50</xmax><ymax>60</ymax></bndbox></object>"
        "<object><bndbox><xmin>70</xmin><ymin>8</ymin>"
        "<xmax>90</xmax><ymax>30</ymax></bndbox></object></annotation>")
    return d


def test_infofile_scan(spark, sample_dir):
    rows = TS.read_infofile(
        spark, str(sample_dir / "infofile.txt")).collect()
    assert [(r["path"], r["label"]) for r in rows] == [
        ("images/a.jpg", "hello world"), ("images/b.jpg", "42 街")]


def test_icdar_gt_strips(spark, sample_dir):
    df = TS.read_icdar_gt(spark, str(sample_dir / "gt_img1.txt"))
    rows = sorted((r["xmin"], r["strip_x1"], r["strip_x2"])
                  for r in df.collect())
    # box 1: x in [10, 101] -> strips k=0..6 (0..112)
    b1 = [r for r in rows if r[0] == 10.0]
    assert b1[0][1] == 0 and b1[-1][2] == 112 and len(b1) == 7
    # box 2: x in [200, 230] -> strips k=12..14
    b2 = [r for r in rows if r[0] == 200.0]
    assert b2[0][1] == 192 and b2[-1][2] == 240 and len(b2) == 3
    # strips are on the stride-16 grid
    assert all(s1 % 16 == 0 and s2 - s1 == 16 for _, s1, s2 in rows)


def test_voc_xml_boxes(spark, sample_dir):
    rows = sorted((r["xmin"], r["ymin"], r["xmax"], r["ymax"])
                  for r in TS.read_voc_xml(
                      spark, str(sample_dir / "ann.xml")).collect())
    assert rows == [(5, 6, 50, 60), (70, 8, 90, 30)]
