"""autoprog_tpu — TPU-native Automated Progressive Learning for ViTs.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
changlin31/AutoProg ("Automated Progressive Learning for Efficient Training
of Vision Transformers", CVPR 2022): progressive resolution/depth/width
growth of VOLO/DeiT image classifiers with an automated sub-network search
("AutoProg") at every stage boundary.

Design notes (TPU-first, not a port):
  * Models are Flax modules with *static* architecture config; elastic depth
    is a static per-layer keep-mask so every (resolution, depth) candidate is
    its own XLA program (the candidate space is tiny, see prog/autogrow.py).
  * Growth operators are pure pytree->pytree functions (prog/growth.py)
    mirroring the reference's slice/clone/clone-noise/clone-ema/super
    remappers (reference: prog/helpers.py).
  * Data parallelism is jax.sharding over a Mesh; gradient psum is emitted
    by XLA from the sharded loss. No DDP objects.
  * bf16 compute / f32 params everywhere (the TPU equivalent of AMP;
    reference: prog/scaler.py becomes a no-op policy).
  * Hot ops (outlook attention unfold->attn->fold) have fused Pallas
    kernels in ops/ with XLA reference implementations kept for bit-checks.
"""

__version__ = "0.1.0"

from autoprog_tpu.registry import create_model, list_models, register_model  # noqa: F401
