from .filters import BloomFilter, CuckooFilter
from .seen import SeenShard, ShardedSeenSet

__all__ = ["BloomFilter", "CuckooFilter", "SeenShard", "ShardedSeenSet"]
