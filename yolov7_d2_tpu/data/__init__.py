from yolov7_d2_tpu.data.catalog import (  # noqa: F401
    DatasetCatalog,
    MetadataCatalog,
    register_coco_instances,
)
from yolov7_d2_tpu.data.coco import load_coco_json  # noqa: F401
from yolov7_d2_tpu.data.loader import (  # noqa: F401
    DataLoader,
    build_detection_test_loader,
    build_detection_train_loader,
    device_prefetch,
)
from yolov7_d2_tpu.data.mappers import (  # noqa: F401
    MyDatasetMapper,
    MyDatasetMapper2,
    SimpleDatasetMapper,
    YOLOXDatasetMapper,
)
