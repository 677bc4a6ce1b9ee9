"""ganreverser_tpu — a TPU-native (JAX/XLA/Pallas/pjit) GAN-inversion framework.

A ground-up rebuild of the capabilities of aleju/gan-reverser (Torch7/Lua,
single GPU) as an idiomatic TPU framework:

* ``models``   — functional module system + the exact G/D/R architecture zoo
                 (reference: models.lua, weight-init.lua)
* ``optim``    — the six reference optimizers (sgd/adagrad/adadelta/adamax/
                 adam/rmsprop) plus grad clamp & L1/L2 transforms
                 (reference: adversarial.lua:8-28,147-188)
* ``data``     — image directory pipeline, color spaces, normalize
                 (reference: dataset.lua, utils/nn_utils.lua:133-379)
* ``train``    — adversarial loop, Reverser loop, the two pretrainers
                 (reference: adversarial.lua, train_r.lua, pretrain_g.lua,
                 pretrain_with_previous_net.lua)
* ``analysis`` — on-device inversion, cosine top-k search, kmeans, G∘R fixing,
                 anomaly detection, latent variation sweeps, plus the new
                 gradient-based latent refinement (reference: apply_r.lua)
* ``ops``      — Pallas TPU kernels (fused cosine top-k, kmeans assignment)
                 with lax reference implementations
* ``parallel`` — device mesh, sharding specs, collective helpers (green-field;
                 the reference is single-device, SURVEY.md §2.4)
* ``io``       — checkpoints (params + optimizer state + config + epoch),
                 image grids with the 5x3 epoch stamp, metrics
* ``cli``      — the seven reference entry points, argparse-based

Design: pure functions + pytrees, single PRNG-key discipline, static shapes,
NHWC layout, bf16 compute / f32 params by default on TPU.
"""

__version__ = "0.1.0"
