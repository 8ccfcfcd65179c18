from avr_tpu.data.dataset import (  # noqa: F401
    SceneInstanceDataset,
    SceneClassDataset,
    collate_observations,
)
from avr_tpu.data.sampling import bbox_sample, gather_rays  # noqa: F401
from avr_tpu.data.synthetic import write_synthetic_hdf5  # noqa: F401
