"""Image IO: native libjpeg codec with a PIL fallback."""
