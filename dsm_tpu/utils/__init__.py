from .tree import masked_update, where_mask, slot_reset
