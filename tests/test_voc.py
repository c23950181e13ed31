"""VOC dataset: multilabel targets and the also_annotation bbox path
(ref datamodules.py:339-460)."""
import numpy as np
import pytest

from bcosification_tpu.data.datamodules import _VOCDataset, VOC_CATEGORIES


def _write_voc(tmp_path, entries):
    """entries: {image_id: (width, height, [(class_name, xmin, ymin, xmax, ymax)])}"""
    from PIL import Image

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    ids = sorted(entries)
    (tmp_path / "ImageSets" / "Main" / "val.txt").write_text("\n".join(ids) + "\n")
    for i, (w, h, objects) in entries.items():
        arr = np.full((h, w, 3), 127, np.uint8)
        Image.fromarray(arr).save(tmp_path / "JPEGImages" / f"{i}.jpg")
        objs = "".join(
            f"<object><name>{n}</name><bndbox>"
            f"<xmin>{x0}</xmin><ymin>{y0}</ymin><xmax>{x1}</xmax><ymax>{y1}</ymax>"
            f"</bndbox></object>"
            for n, x0, y0, x1, y1 in objects
        )
        (tmp_path / "Annotations" / f"{i}.xml").write_text(
            f"<annotation><size><width>{w}</width><height>{h}</height>"
            f"<depth>3</depth></size>{objs}</annotation>"
        )


@pytest.fixture
def voc_root(tmp_path):
    _write_voc(tmp_path, {
        "img0": (448, 112, [("dog", 100, 20, 300, 100), ("person", 0, 0, 448, 112)]),
        "img1": (224, 224, [("cat", 10, 10, 50, 60)]),
    })
    return tmp_path


def test_voc_multilabel_target(voc_root):
    ds = _VOCDataset(str(voc_root), "val")
    assert len(ds) == 2
    img, target = ds[0]
    assert target.shape == (20,)
    want = np.zeros(20, np.float32)
    want[VOC_CATEGORIES.index("dog")] = 1
    want[VOC_CATEGORIES.index("person")] = 1
    np.testing.assert_array_equal(target, want)


def test_voc_also_annotation_bbox_roundtrip(voc_root):
    """Boxes come back rescaled to 224 with int truncation + [0,223] clamp —
    byte-exact with the reference's arithmetic (ref datamodules.py:404-425)."""
    ds = _VOCDataset(str(voc_root), "val", also_annotation=True)
    img, target, bbs = ds[0]
    # img0 is 448x112: wscale = 0.5, hscale = 2.0
    dog = VOC_CATEGORIES.index("dog")
    person = VOC_CATEGORIES.index("person")
    assert [dog, 50, 40, 150, 200] in bbs
    assert [person, 0, 0, 223, 223] in bbs  # xmax 448*0.5=224 clamps to 223
    assert len(bbs) == 2

    img, target, bbs = ds[1]
    cat = VOC_CATEGORIES.index("cat")
    assert bbs == [[cat, 10, 10, 50, 60]]  # identity scale

    # default path is unchanged: 2-tuples
    assert len(_VOCDataset(str(voc_root), "val")[0]) == 2
