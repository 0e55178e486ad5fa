from .fingerprint import RequestFingerprint
from .project import extract_relevant_text, relevant_text_batch

__all__ = ["RequestFingerprint", "extract_relevant_text",
           "relevant_text_batch"]
