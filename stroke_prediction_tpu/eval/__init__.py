from stroke_prediction_tpu.eval import metrics  # noqa: F401
