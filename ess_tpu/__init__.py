"""ess-tpu: TPU-native event-camera semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of uzh-rpg/ess
(ECCV 2022 "Learning Event-based Semantic Segmentation from Still Images"):

- raw event streams (HDF5 / memmap) -> rectified voxel grids, built on-device
  by a fused Pallas scatter-add kernel (``ess_tpu.ops``)
- an E2VID-style recurrent ConvLSTM UNet rolled out under ``jax.lax.scan``
  (``ess_tpu.models.e2vid``, ``ess_tpu.recon``)
- a ResNet18 grayscale image encoder and a shared skip-connected semantic
  segmentation decoder (``ess_tpu.models``)
- supervised and UDA (image -> event domain adaptation) training engines with
  dice/cross-entropy/symmetric-JS losses and RAdam (``ess_tpu.train``)
- data-parallel scale-out over a ``jax.sharding.Mesh`` (``ess_tpu.parallel``)

Layer map mirrors SURVEY.md section 1; parity pointers into the reference
repo are cited per-module as ``file:line`` of /root/reference.
"""

__version__ = "0.1.0"
