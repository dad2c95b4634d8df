"""Multi-chip parallelism: mesh construction and sharded ciphertext
batches.

The reference's parallelism story is task-parallel DAG execution over a
multicore CPU (Galois worklists; reference multicore_program_traversal.h)
plus SIMD slot batching inside each ciphertext. The TPU-native mapping
(SURVEY.md §2.9):

  * slot batching       -> unchanged (one ciphertext = N/2 slots)
  * task parallelism    -> XLA instruction scheduling inside one jitted
                           program (no host worklists)
  * NEW: batch axis     -> independent ciphertexts sharded over the mesh
                           ("dp"-like; embarrassingly parallel)
  * NEW: limb axis      -> RNS sub-prime planes sharded over the mesh
                           ("tp"-like; NTT/dyadic ops are limb-local,
                           rescale/key-switch gather single limb rows)
  * NEW: host axis      -> DCN dimension under jax.distributed; the
                           batch sharding (zero-communication) crosses
                           hosts while limb/digit collectives ride ICI
  * NEW: sharded-N NTT  -> one all-to-all between the two four-step
                           phases when a single polynomial is sharded
                           (ntt_shard.ShardedNTT)
  * NEW: seq axis       -> the sharded-N form integrated into the jitted
                           executor ("sp"-like; make_device_mesh
                           seq_axis=D shards the ring axis of EVERY
                           polynomial in a compiled program's execution —
                           the latency-scaling axis; seq_exec)
"""

from .sharding import (make_device_mesh, shard_batch, batch_axes,
                       batch_pipeline_step, replicated)
from .ks_shard import ShardedKeySwitch
from .ntt_shard import ShardedNTT, get_sharded_ntt
from .seq_exec import SeqLevelOps, get_seq_ops, seq_compatible
