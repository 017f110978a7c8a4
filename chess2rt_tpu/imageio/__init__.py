from .bmp import BmpImage, load_bmp, load_bmp_file, save_bmp, save_bmp_file  # noqa: F401
