from .dist import fleet_shard, global_batch, init_distributed, topology_mesh
from .shard import ShardedDecoder, batch_decode
