from yolov7_d2_tpu.data.transforms import augment  # noqa: F401
