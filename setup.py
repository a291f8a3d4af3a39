from setuptools import setup, find_packages

setup(
    name="brushstroke_engine_tpu",
    version="0.1.0",
    description=("TPU-native Neural Brushstroke Engine: geometry-conditioned "
                 "StyleGAN2 brush styles with interactive painting, built on "
                 "JAX/XLA for TPU"),
    packages=find_packages(include=["brushstroke_engine_tpu",
                                    "brushstroke_engine_tpu.*"]),
    package_data={
        "brushstroke_engine_tpu.ui": ["static/*", "templates/*"],
    },
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "optax",
        "numpy",
        "scipy",
        "Pillow",
        "tornado",
    ],
    extras_require={
        "dev": ["pytest"],
    },
)
