"""lmat_tpu — a TPU-native metagenomic classification framework.

A from-scratch re-design of the capabilities of LMAT (Livermore Metagenomics
Analysis Toolkit) for TPU hardware: reads are batched and k-mer encoded as
two-lane uint32 tensors in JAX, the k-mer -> taxid-set database is a two-level
sorted index held in device HBM (optionally sharded across a mesh), lookups and
per-read scoring run as XLA/Pallas programs, and the taxonomy logic operates on
dense integer arrays (parent/depth/path matrices) so ancestor tests are gathers.

Reference behavior studied from /root/reference (LMAT v1.2.4); this package is
an original implementation, not a port.
"""

__version__ = "0.1.0"
