from ssdr_al_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
from ssdr_al_tpu.train.metrics import confusion_matrix, iou_from_confusion  # noqa: F401
