"""ctypes loader for the native analyzer (compiled on first use, cached).

Pure-Python fallbacks keep everything working when no compiler is available;
`vod_tpu.native.analyze_texts` / `build_postings` pick the native path when the
shared library loads.
"""

from .loader import analyze_texts, build_postings, native_available

__all__ = ["analyze_texts", "build_postings", "native_available"]
