"""TPU-native news-recommendation framework (NAML/NRMS family on MIND).

A brand-new JAX/XLA/Pallas implementation — not a PyTorch port — with the
capabilities of the reference (patngnw/NewsRecommendation, see SURVEY.md):

- ``data``      : MIND corpus readers, vocab building, negative sampling,
                  fixed-shape padded batch loader (reference ``preprocess.py``,
                  ``prepare_data.py``, ``dataset.py`` behaviors).
- ``embeddings``: offline title-embedding precompute + frozen table store
                  (reference ``preprocess.py:112-239``).
- ``ops``       : pure-function encoder blocks — additive attention pooling,
                  exp-normalized scaled-dot attention, multi-head self
                  attention, conv1d title encoder — plus Pallas TPU kernels
                  (reference ``model/model_utils.py``).
- ``models``    : NRMS and NAML as news-encoder/user-encoder/scorer triples
                  with a name registry (reference ``model/NRMS.py``,
                  ``model/NAML.py``, ``main.py:63``).
- ``parallel``  : device mesh construction, data-parallel sharding, and
                  row-sharded embedding tables with all-to-all lookup
                  (replaces torch DDP/NCCL, ``main.py:31,82``).
- ``train``     : jitted/sharded train step + host train loop with
                  throughput counters (reference ``main.py:22-142``).
- ``eval``      : two-phase evaluation — whole-corpus news-vector precompute,
                  then vectorized impression scoring + batched AUC/MRR/nDCG
                  (reference ``main.py:145-277``).
- ``ckpt``      : checkpoint/resume of the train-state pytree with vocab
                  sidecars, frozen tables excluded (reference
                  ``main.py:118-142``).
- ``metrics``   : ranking metrics, numpy (per-impression oracle) and
                  vectorized JAX (batched, mask-aware) implementations
                  (reference ``metrics.py``, de-duplicating ``utils.py:43-61``).
- ``cli``       : train/test/train_test/create_embeddings entry points with
                  the reference's flag names (reference ``parameters.py``).
"""

__version__ = "0.1.0"

from newsrecommendation_tpu.config import Config  # noqa: F401
