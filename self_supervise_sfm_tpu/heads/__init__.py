from . import act, camera, dpt, dpt_utils  # noqa: F401
