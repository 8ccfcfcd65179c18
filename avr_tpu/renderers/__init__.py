from avr_tpu.renderers.base import (  # noqa: F401
    RenderOutput,
    VolumeRendererConfig,
    RaymarcherConfig,
    AdaptiveRendererConfig,
    renderer_config_from_conf,
)
from avr_tpu.renderers.lstm import MarchLSTMCell, clamp_grad  # noqa: F401
from avr_tpu.renderers.volume import render_volume  # noqa: F401
from avr_tpu.renderers.raymarch import lstm_march, render_raymarcher  # noqa: F401
from avr_tpu.renderers.adaptive import render_adaptive  # noqa: F401
