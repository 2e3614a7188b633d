"""ExPecto-TPU: a TPU-native expression-effect prediction engine.

A from-scratch JAX/XLA/Pallas re-design of the ExPecto pipeline
(reference: richardshuai/ExPecto).  The reference is a collection of ~30
CUDA/torch batch scripts communicating through files; this package is one
engine library with thin CLI facades that reproduce the reference's
file-level contracts (VCF in -> per-shift ``.diff.h5`` -> ``sed.tsv``;
feature ``.npy`` -> trained expression model).

Subpackages
-----------
- ``genome``   : FASTA indexing, VCF parsing, liftover, one-hot encoding,
                 window math (reference L1, chromatin.py / expecto_utils.py).
- ``models``   : Beluga CNN in JAX (reference Beluga.py:18-51) and the
                 gblinear expression model (reference train.py:140-146,
                 replacing the xgboost native core).
- ``ops``      : TPU compute kernels: conv stack, decay-basis projection,
                 Pallas fusions.
- ``parallel`` : device mesh, shardings, collectives (replaces the
                 reference's filesystem-based chunk/merge scale-out, L7).
- ``pipeline`` : end-to-end drivers (chromatin effects, SED scoring,
                 gene features, consensus prediction, training).
- ``analysis`` : interpretation, clustering, motif enrichment, bootstrap
                 statistics (reference L6).
- ``io``       : HDF5/CSV readers and writers matching the reference's
                 on-disk schemas.
- ``cli``      : argparse front-ends mirroring the reference scripts.
"""

__version__ = "0.1.0"
