from .log import init, stage_timer  # noqa: F401
