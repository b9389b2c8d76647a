"""TPU-native functional kernels over channels-last volumes.

Every op has an XLA (`lax`/`jnp`) reference implementation; hot ops gain
Pallas TPU kernels behind the same facade (selected via ``impl=``).  These
are the TPU equivalents of the reference's third-party native kernels
(SURVEY.md §2.1): scipy.ndimage zoom / gaussian_filter / map_coordinates /
distance_transform_edt and torch pooling/upsampling.
"""

from stroke_prediction_tpu.ops.pooling import max_pool3d  # noqa: F401
from stroke_prediction_tpu.ops.resize import (  # noqa: F401
    resize_linear, resize_nearest, zoom_inplane, upsample2x_trilinear,
    center_crop,
)
from stroke_prediction_tpu.ops.warp import (  # noqa: F401
    gaussian_filter3d, map_coordinates_linear, elastic_fields,
    elastic_deform3d,
)
from stroke_prediction_tpu.ops.edt import (  # noqa: F401
    distance_transform_edt, signed_edt,
)
