"""srcfinder_tpu — TPU-native AVIRIS-NG methane SourceFinder.

A ground-up JAX/XLA/Pallas re-design of the capabilities of JPL's
srcfinder toolkit (reference: dsmbgu8/srcfinder):

- ``core``     ENVI raster I/O, geodesy, morphology, tiling, label codecs
               (reference: srcfinder_util.py)
- ``cmf``      columnwise robust matched filter (reference: cmf/robust_mf.py)
- ``models``   GoogLeNet-1ch in Flax + torch weight conversion
               (reference: cnn/archs/googlenet1.py)
- ``detect``   CNN/FCN saliency pipelines, salience->plume candidates,
               detection filtering (reference: cnn/*_pred_pipeline.py,
               salience_predictions.py, srcfinder_util.filtdet)
- ``masks``    spectrometer QC masks (reference: spectrometer_masks/masks_sds.py)
- ``train``    SAM training harness (reference: cnn/training/experiment_script_all.py)
- ``triage``   CMF column-systematics triage (reference: triage/cmf_profile.py)
- ``flow``     wind/emission/cluster/dedup/persistence workflow
               (reference: msf_flow/)
- ``qc``       plume QC label management (reference: cmftagger/)
- ``parallel`` device-mesh sharding utilities (pjit/shard_map)

The compute path is JAX (jit/vmap/shard_map); host-side raster I/O is
numpy memmaps with an async prefetcher. (A Pallas moments kernel was
benchmarked against XLA's fusion on hardware and removed when XLA won —
see SCALING.md "Pallas verdict".)
"""

__version__ = "0.1.0"
