from . import flash_attention
