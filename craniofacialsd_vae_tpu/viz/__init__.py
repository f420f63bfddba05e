from .logging import JsonlWriter
