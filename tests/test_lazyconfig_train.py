"""The LazyConfig driver must OWN the train loop (VERDICT r1 item 9):
``configs/common/yolox_s_lazy.py`` ships no ``run()`` — the driver's
``do_train`` (tools/lazyconfig_train_net.py, parity with the reference's
:43-130) must train it end-to-end."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_yolox_s_lazy_trains_without_run(tmp_path):
    import lazyconfig_train_net as L

    from yolov7_d2_tpu.config.lazy import LazyConfig

    cfg = LazyConfig.load(f"{REPO}/configs/common/yolox_s_lazy.py")
    assert "run" not in cfg  # the driver owns the loop
    # tiny overrides for the smoke run
    cfg["model"]["width_mul"] = 0.125
    cfg["train"]["max_iter"] = 3
    cfg["train"]["input_size"] = (64, 64)
    cfg["train"]["ims_per_batch"] = 2
    cfg["train"]["output_dir"] = str(tmp_path)
    cfg["train"]["checkpointer"] = {"period": 3}
    trainer = L.do_train(cfg, resume=False)
    assert int(trainer.state.step) == 3
    assert os.path.isdir(str(tmp_path))


def test_lazy_fragments_compose():
    from yolov7_d2_tpu.config.lazy import LazyConfig, instantiate

    for frag, key in [
        ("configs/common/data/coco.py", "dataloader"),
        ("configs/common/data/coco_keypoint.py", "dataloader"),
        ("configs/common/models/detr_r50.py", "model"),
        ("configs/common/optim.py", "sgd"),
        ("configs/common/coco_schedule.py", "lr_multiplier_1x"),
    ]:
        cfg = LazyConfig.load(f"{REPO}/{frag}")
        assert key in cfg, (frag, sorted(cfg))
    model = instantiate(
        LazyConfig.load(f"{REPO}/configs/common/models/detr_r50.py")["model"]
    )
    assert model.num_queries == 100
