"""ccedit-tpu: a TPU-native (JAX/XLA/Pallas/pjit) video-editing diffusion framework.

A from-scratch re-design of the capabilities of CCEdit (CVPR 2024,
arXiv:2309.16496; reference implementation surveyed in SURVEY.md): text- and
image-guided video editing with a pseudo-3D Stable-Diffusion UNet, per-frame
ControlNet structure control, a reference-frame appearance branch with
cross-frame cross-attention (CFCA), a KL-VAE first stage, and k-diffusion-style
samplers with classifier-free guidance.

Design principles (TPU-first, not a port):
  * all models are pure-functional flax.linen modules in channels-last layout;
  * the whole denoising loop is one jit-compiled ``lax.scan`` program;
  * sampler schedules are precomputed host-side in float64 and fed to the scan
    as per-step constant arrays (no data-dependent control flow on device);
  * parallelism is expressed with ``jax.sharding`` over a device Mesh; XLA
    emits the collectives (no hand-written NCCL-equivalent);
  * hot attention ops route through Pallas flash-attention kernels on TPU with
    an XLA fallback for CPU testing.
"""

__version__ = "0.1.0"
