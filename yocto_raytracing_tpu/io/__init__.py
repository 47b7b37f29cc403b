"""Host-side I/O: scene file parsing and image codecs."""
