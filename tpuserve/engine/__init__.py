from tpuserve.engine.backend import Backend, get_backend_class, register_backend  # noqa: F401
from tpuserve.engine.manager import InferenceManager, ModelState  # noqa: F401
from tpuserve.engine.model import Model, ModelMetadata  # noqa: F401
from tpuserve.engine.stats import ModelStats  # noqa: F401
