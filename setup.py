from setuptools import find_packages, setup

setup(
    name="aps_tpu",
    version="0.1.0",
    description="TPU-native (JAX/XLA/Pallas) speech processing toolkit "
                "with the capability surface of funcwj/aps",
    packages=find_packages(include=["aps_tpu", "aps_tpu.*"]),
    python_requires=">=3.10",
)
