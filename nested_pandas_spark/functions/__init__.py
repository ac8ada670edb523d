from .nested import *
