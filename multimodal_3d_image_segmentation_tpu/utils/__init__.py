from .torch_compat import (export_reference_state_dict,  # noqa: F401
                           import_reference_state_dict)
