"""JSON IPC serving layer (SURVEY.md §7 step 4).

The reference's Windows named-pipe service (ocr_ipc_service.cpp) becomes a
Unix-domain-socket asyncio server speaking the identical JSON command
protocol; the cpu/gpu worker pools become an async dispatcher feeding
logical workers that share one device-resident engine.
"""

from .balancer import OCRBalancer, ServiceSupervisor
from .client import OCRIPCClient
from .executor import Dispatcher
from .service import OCRIPCService

__all__ = [
    "Dispatcher",
    "OCRBalancer",
    "OCRIPCClient",
    "OCRIPCService",
    "ServiceSupervisor",
]
