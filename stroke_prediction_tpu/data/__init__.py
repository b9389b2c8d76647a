from stroke_prediction_tpu.data.dataset import (  # noqa: F401
    KEY_CASE_ID, KEY_IMAGES, KEY_LABELS, KEY_GLOBAL,
    MOD_CBV, MOD_TTD, MOD_UNET_CORE, MOD_UNET_PENU,
    LABEL_CORE, LABEL_PENU, LABEL_LESION,
    StrokeDataset3D, NiftiCaseProvider, SyntheticCaseProvider,
)
from stroke_prediction_tpu.data.loader import (  # noqa: F401
    fold_split, BatchLoader, get_stroke_shape_training_data,
    get_stroke_prediction_training_data, get_testdata,
)
