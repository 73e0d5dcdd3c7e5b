from .stream import stream_extract
