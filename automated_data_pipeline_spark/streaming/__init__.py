"""Structured Streaming surface: file-drop trigger (the reference's
upload->run path) and event-time windowed/sessionized aggregations with
watermarks."""
