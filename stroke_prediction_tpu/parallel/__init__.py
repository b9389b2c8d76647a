from stroke_prediction_tpu.parallel.mesh import (  # noqa: F401
    make_data_mesh, make_mesh, batch_sharding, replicate)
