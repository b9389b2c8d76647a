from stroke_prediction_tpu.core import dto  # noqa: F401
