from avr_tpu.training.loss import loss_fn, LossParams  # noqa: F401
from avr_tpu.training.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
)
from avr_tpu.training.step import (  # noqa: F401
    make_train_step,
    make_chunked_call_train_step,
    make_eval_step,
    make_encode_fn,
    make_render_fn,
)
from avr_tpu.training.loop import (  # noqa: F401
    FitConfig, fit, render_full_image, validate, validate_scenes,
)
from avr_tpu.training.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    checkpoint_path,
)
