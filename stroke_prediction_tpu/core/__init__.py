from stroke_prediction_tpu.core import config, dto  # noqa: F401
