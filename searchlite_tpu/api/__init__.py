"""Public API: builder, writer, reader, request/response types."""
