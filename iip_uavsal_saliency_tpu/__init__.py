"""UAVSal-TPU: a TPU-native (JAX/XLA/Pallas/pjit) saliency-prediction framework.

A from-scratch re-design of the capabilities of zhangkao/IIP_UAVSal_Saliency
("An Efficient Saliency Prediction Model for Unmanned Aerial Vehicle Video",
ISPRS 2022) for TPU hardware:

- NHWC layouts, XLA-fused convolutions, bfloat16-friendly compute paths.
- The ConvTWA recurrence is a `lax.scan` with the gate convolution split into a
  batched input-projection (one big MXU conv over all frames) plus a small
  per-step hidden conv, instead of the reference's per-frame Python loop
  (reference: model_convlstm.py:364-377).
- Frame-difference temporal convs are vectorized shifts over the time axis
  (reference: model.py:188-208 loops frame-at-a-time).
- Data/model parallelism via `jax.sharding.Mesh` + XLA collectives; the
  reference is single-GPU only.

Subpackages
-----------
ops         core NN primitives (conv/BN/ReLU6 blocks, resize, inits, stats)
            + Pallas TPU kernels for the hot fused ops (ops/pallas_twa.py)
models      backbones, SRF-Net, STBlocks, recurrent cells, UAVSal + ablations
data        letterbox/priors/.mat I/O/video decode/dataset splits
training    losses, optimizer, train loop (TBPTT over clips), checkpoints
parallel    device meshes, sharded train/infer steps
evaluation  the 7 saliency metrics (device + host) and score drivers
vis         heatmap overlays and video writers
runners     end-to-end train/test/eval/visualize pipelines
"""

__version__ = "0.1.0"
