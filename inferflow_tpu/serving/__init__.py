"""HTTP serving: streaming service + OpenAI-compatible API + client.

reference: src/service/ (inferflow_service.cc, service_data.cc).
"""

from .http_server import InferFlowService, InferFlowServiceCore  # noqa: F401
from .service_data import InferFlowRequest, ResponseChunk  # noqa: F401
from .client import InferFlowClient  # noqa: F401
