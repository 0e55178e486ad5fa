from . import (clean, dataset_tools, dedup, embed, index_prep, multimodal,
               similarity, text_analysis)

__all__ = ["clean", "dataset_tools", "dedup", "embed", "index_prep",
           "multimodal", "similarity", "text_analysis"]
