from . import datasets, io
