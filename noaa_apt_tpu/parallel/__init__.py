from .shard import ShardedDecoder, batch_decode
