from tpuserve.models.registry import Architecture, get_architecture, register_architecture  # noqa: F401
