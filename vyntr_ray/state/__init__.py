from .filters import BloomFilter, CuckooFilter
from .frontier import BucketedFrontier
from .seen import SeenShard, ShardedSeenSet

__all__ = ["BloomFilter", "BucketedFrontier", "CuckooFilter",
           "SeenShard", "ShardedSeenSet"]
