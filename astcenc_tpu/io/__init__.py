"""Container and image file I/O (.astc, KTX, DDS, PNG/TGA/BMP, HDR)."""
