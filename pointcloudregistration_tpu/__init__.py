"""pointcloudregistration_tpu — TPU-native point-cloud registration framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
repository VatsalPandey0202/PointCloudRegistration (TOF-MRI / PC-MRI point-cloud
co-registration): data generation, classical registration (FPFH+RANSAC+ICP, CPD),
learned descriptors (DIP), end-to-end rigid registration (ROPNet), and the
two-stage C2P pipeline (NgeNet rigid + Neural Deformation Pyramid non-rigid).

Layering (bottom-up):
  core/      pure-jnp geometry: SO(3)/SE(3) maps, Procrustes, 3x3 eig, PPF
  ops/       compute kernels: kNN/Chamfer (Pallas), FPS, ball query, voxel
             subsample, radius neighbor tables, FPFH, LRF, RANSAC, ICP, CPD
  models/    flax modules: DIP descriptor, ROPNet (CG+TFMR), NgeNet (KPConv),
             NDP deformation pyramid, PointNet QC
  losses/    hardest-contrastive, circle, overlap/saliency BCE, ROPNet losses
  metrics/   RRE/RTE, truncated Chamfer, FMR, inlier ratio, registration recall
  data/      synthetic phantom pair factory, augmentation, batching
  parallel/  device mesh, ring kNN/Chamfer over point blocks, psum Procrustes
  pipelines/ dataprep / dip / ropnet / ngenet / c2p harnesses
"""

__version__ = "0.1.0"
