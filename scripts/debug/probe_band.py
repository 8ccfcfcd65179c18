"""Diagnose the all-white fine image on TPU: stats of marched distance,
band z-values, and band-query sigma for the fused vs unfused paths."""
import os, sys, dataclasses, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_prng_impl", "rbg")
import optax

from avr_tpu.config import parse_conf
from avr_tpu.data.synthetic import write_synthetic_hdf5
from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import AdaptiveRendererConfig
from avr_tpu.training import LossParams, create_train_state, make_train_step
from avr_tpu.training.loop import select_source_views
from avr_tpu.utils.geometry import get_opencv_pixel_coordinates

conf = parse_conf("conf/default_mv.conf")
base_cfg = ModelConfig.from_conf(conf["model"])
rcfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])
tmp = tempfile.mkdtemp()
h5 = write_synthetic_hdf5(os.path.join(tmp, "t.hdf5"), num_instances=4, num_views=8, side=64)
dset = SceneClassDataset(h5, img_sidelength=64, samples_per_instance=8)
vb = next(dset.batches(1))
rng = np.random.default_rng(0)
si, sp, focal, c = select_source_views(rng, vb, 1, fixed_idx=[0])

for fused in (False, True):
    mcfg = dataclasses.replace(
        base_cfg,
        encoder=dataclasses.replace(base_cfg.encoder, norm_type="group", pretrained=False),
        gather_impl="pallas" if fused else "xla",
        fused_mlp="always" if fused else "never",
    )
    model = RadFieldRenderer(model_cfg=mcfg, renderer_cfg=rcfg, dtype=jnp.bfloat16,
                             fused_march="always" if fused else "never")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(si), jnp.asarray(sp),
                           jnp.asarray(focal), jnp.asarray(c), method=model.init_all)

    # full-image rays for target view 1 (matches validate())
    sl = 64
    xy = get_opencv_pixel_coordinates(sl, sl).reshape(1, -1, 2)[:, :4096]
    intr = jnp.asarray(vb["intrinsics"][:, 1])
    c2w = jnp.asarray(vb["cam2world"][:, 1])[:, None].repeat(xy.shape[1], 1)

    def probe(variables):
        def run(mdl):
            cond = mdl.encode(jnp.asarray(si), jnp.asarray(sp), jnp.asarray(focal),
                              jnp.asarray(c), train=False)
            out = mdl.render(cond, xy, intr, c2w, jax.random.PRNGKey(0), train=False)
            return out
        return model.apply(variables, method=lambda m: run(m))

    out = jax.jit(probe)(variables)
    rf = np.asarray(out.rgb_fine)
    rc = np.asarray(out.rgb_coarse)
    df = np.asarray(out.depth_fine)
    print(f"fused={fused}: rgb_fine min={rf.min():.6f} max={rf.max():.6f} "
          f"frac_white={(rf > 0.9999).mean():.4f} | rgb_coarse sd={rc.std():.4f} | "
          f"depth_fine min={df.min():.4f} max={df.max():.4f} mean={df.mean():.4f} "
          f"nan={np.isnan(rf).any()}")
