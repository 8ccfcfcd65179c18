from avr_tpu.ops.sampling import sample_coarse, sample_fine, sample_depth  # noqa: F401
from avr_tpu.ops.integrate import volume_integral  # noqa: F401
from avr_tpu.ops.grid_sample import grid_sample_2d  # noqa: F401
