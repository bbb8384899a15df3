"""Mesh/sharding layer: shard_map pipelines and ICI halo exchange."""

from simpledsp_tpu.parallel.mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    make_mesh,
    replicate,
    shard_signal,
    single_device_mesh,
)
from simpledsp_tpu.parallel.iir import ShardedBlockIIR
from simpledsp_tpu.parallel.sdr import ShardedReceiverBank
from simpledsp_tpu.parallel.fir import (
    ShardedChannelizer,
    ShardedConvolve,
    ShardedFIR,
    ShardedOverlapSaveFIR,
    halo_exchange,
)
from simpledsp_tpu.parallel.spectral import ShardedSTFT
