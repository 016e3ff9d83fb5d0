"""mm_training_tpu — a TPU-native multimodal BEV 3D-detection training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aimotive/mm_training (BEVDepth-derived camera+LiDAR+radar BEV detector on the
aiMotive Multimodal Dataset). The compute path is pure JAX (jit/pjit over a
`jax.sharding.Mesh`); host IO produces fixed-shape padded batches so the whole
train step is a single compiled XLA program with no host round-trips.

Layout:
    configs/     dataclass config surface mirroring exps/conf_aim.py knob names
    core/        boxes, rotations, camera/frustum geometry (numpy + jax)
    ops/         device kernels: lift-splat voxel pooling, voxelization,
                 circle NMS, gaussian heatmap targets, depth labels, warps
    models/      flax.linen modules: ResNet, SECONDFPN, DepthNet, LSSFPN,
                 lidar pillar/BEV encoder, fusion, CenterPoint head
    data/        aiMotive dataset walker, sensor loaders, camera models,
                 fixed-shape collate, synthetic fixtures
    parallel/    mesh construction + sharding rules (dp over ICI; room for a
                 model axis)
    training/    optax/orbax train loop, EMA, LR schedules, checkpoints
    evaluation/  BEV mAP calculator (host-side numpy, parity with utils/eval.py)
    exps/        train / eval / inference entry points
"""

__version__ = "0.1.0"
