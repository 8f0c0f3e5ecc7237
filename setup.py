"""Build the native runtime libraries as part of the package build.

The two shared objects (`_flake_native.so` — bitstream packer / CRC /
MD5 / stitcher; `_flake_verifier.so` — verification-decoder inner
loops) are plain `extern "C"` libraries loaded with ctypes, so the
extensions are named without an ABI tag. If no C++ toolchain is
available at install time the build is skipped and the runtime
loader (flake_tpu/native/__init__.py) compiles on first use instead.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class CtypesExtension(Extension):
    pass


class OptionalBuildExt(build_ext):
    def get_ext_filename(self, fullname):
        # inplace builds call this with only the last dotted component
        # (distutils get_ext_fullpath), so key on the basename as well —
        # otherwise the lookup misses and the extension gets an
        # ABI-tagged name the ctypes loader never finds
        ext = self.ext_map.get(fullname) \
            or self.ext_map.get(fullname.split(".")[-1])
        if isinstance(ext, CtypesExtension):
            return fullname.replace(".", "/") + ".so"
        return super().get_ext_filename(fullname)

    def run(self):
        try:
            super().run()
        except Exception as exc:  # no toolchain: runtime build fallback
            self.warn(f"native extension build skipped: {exc}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:
            self.warn(f"building {ext.name} skipped: {exc}")


FLAGS = ["-O3", "-std=c++17", "-fopenmp", "-fPIC"]

setup(
    ext_modules=[
        CtypesExtension(
            "flake_tpu.native._flake_native",
            sources=["flake_tpu/native/packer.cpp"],
            extra_compile_args=FLAGS,
            extra_link_args=["-fopenmp"],
        ),
        CtypesExtension(
            "flake_tpu.native._flake_verifier",
            sources=["flake_tpu/native/verifier.cpp"],
            extra_compile_args=FLAGS,
            extra_link_args=["-fopenmp"],
        ),
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
