from .torch_compat import import_reference_state_dict  # noqa: F401
