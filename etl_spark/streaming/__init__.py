from .stream_runner import stream_replay  # noqa: F401
