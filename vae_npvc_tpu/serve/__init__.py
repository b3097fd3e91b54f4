"""Online serving for voice conversion: warm bucketed engine + HTTP front.

The reference has no serving story at all — its inference path is the batch
``decode.py`` CLI over a trials file (reference: vae_npvc/bin/decode.py,
vae_npvc/decoder/basic.py). This package adds the production-deployment
layer on top of the same model/front-end code: a :class:`ConversionEngine`
that keeps the full wav→mel→convert→vocoder chain compiled and resident on
the device with a small set of bucket shapes, coalesces concurrent requests
into batched device calls, and a dependency-free threaded HTTP server
(`bin/serve.py`) exposing it.
"""

from .engine import ConversionEngine, DEFAULT_FEATURE
from .streaming import StreamingSession

__all__ = ["ConversionEngine", "DEFAULT_FEATURE", "StreamingSession"]
