"""Native (C++) kernels: host-side MAS (see mas.cc). Built on demand."""

from .build import maximum_path_cpp, load_mas_library
