from .stream import StreamFrame, rate_stream, file_stream

__all__ = ["StreamFrame", "rate_stream", "file_stream"]
