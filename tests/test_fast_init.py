"""fast_init must produce the exact same variable tree as full init."""
import jax

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.synthetic import make_batch
from ocrfdet_tpu.models.detector import OcRFDet
from ocrfdet_tpu.utils.fast_init import fast_init
import pytest

pytestmark = pytest.mark.slow


def test_fast_init_tree_matches_full():
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    base = tiny_config(with_ocrf=True)
    # enlarge spatially so fast_init actually inits at a smaller size
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, input_size=(128, 352)),
        vt=dataclasses.replace(base.vt, render_image_size=(128, 352)))
    variables_fast, model = fast_init(cfg, OcRFDet, train=True)

    batch = make_batch(cfg, batch_size=1, seed=0)
    batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in batch.items()}
    variables_full = model.init(jax.random.PRNGKey(0), batch, train=True)

    s_fast = jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                          variables_fast)
    s_full = jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                          variables_full)
    assert s_fast == s_full

    # and the fast-initialised variables drive the full-size model
    (preds, aux), _ = model.apply(variables_fast, batch, train=True,
                                  mutable=["batch_stats"])
    assert np.isfinite(float(jnp.sum(preds[0]["heatmap"])))
