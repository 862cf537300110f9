import pytest

from yolov4_tpu.config import Config, load_config


def test_defaults_load():
    cfg = load_config()
    assert cfg["MODEL"]["N_CLASSES"] == 80
    assert cfg["TRAIN"]["IMGSIZE"] == 608
    assert len(cfg["MODEL"]["ANCHORS"]) == 9


def test_shipped_configs_load():
    for name in ("yolov4_Tianxiaomo", "yolov4_default"):
        cfg = load_config(f"configs/{name}.cfg")
        assert cfg["MODEL"]["TYPE"] == "YOLOv4"
        assert cfg["CRITERION"]["IGNORE_THRESH"] == 0.7
        # defaults fill in TPU-only keys absent from the file
        assert cfg["MODEL"]["SPP_LEGACY_POOLS"] is True
        assert cfg["TEST"]["MAX_DETS"] == 100


def test_reference_style_config_keys():
    cfg = load_config("configs/yolov4_Tianxiaomo.cfg")
    assert cfg["LR_SCHEDULER"]["MILESTONES"] == [50, 70, 80]
    assert cfg["TRAIN"]["MAX_EPOCHS"] == 90
    assert cfg["TEST"]["CONFTHRE"] == 0.005
    cfg2 = load_config("configs/yolov4_default.cfg")
    assert cfg2["LR_SCHEDULER"]["MILESTONES"] == [60, 90, 110]
    assert cfg2["TRAIN"]["ACCUMULATION_STEPS"] == 4


def test_validation_rejects_bad_anchor_mask():
    with pytest.raises(ValueError):
        Config.from_dict({"MODEL": {"ANCHOR_MASK": [[0, 1], [2, 3], [4, 5]]}})


def test_validation_rejects_bad_imgsize():
    with pytest.raises(ValueError):
        Config.from_dict({"TRAIN": {"IMGSIZE": 600}})


def test_quant_mode_validation():
    # the contract the detect.py/val.py --quant flags rely on
    for mode in ("none", "int8", "int8_static"):
        cfg = Config.from_dict({"MODEL": {"QUANT": mode}})
        assert cfg["MODEL"]["QUANT"] == mode
    with pytest.raises(ValueError):
        Config.from_dict({"MODEL": {"QUANT": "int4"}})
