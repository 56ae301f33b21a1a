"""ucfp_tpu — TPU-native universal content fingerprinting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
bravo1goingdark/ucfp (reference surveyed in SURVEY.md):

* text / image / audio fingerprinting behind the same HTTP API,
* an embedded multi-tenant index with BM25 + cosine k-NN,
* hybrid retrieval fused with Reciprocal Rank Fusion,
* every byte->fingerprint transform batched onto TPU (MXU matmul DCTs,
  matmul-DFT spectrograms, masked dense landmark pairing),
* the ANN query path as a tiled Hamming-popcount + cosine top-k kernel
  over an ICI-sharded HBM fingerprint matrix.

Layer map (mirrors SURVEY.md section 1):
  core/      record / query / hit contract + error taxonomy
  ops/       device kernels (image, text, audio, top-k)
  parallel/  mesh + sharded query kernels
  index/     storage, catalog, BM25 (host)
  matcher/   hybrid retrieval + RRF
  rerank/    optional second stage
  server/    HTTP API, auth, rate limiting, usage metering
  ingest/    request batching onto fixed-size device batches
"""

__version__ = "0.1.0"

FORMAT_VERSION = 1
