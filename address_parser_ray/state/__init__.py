from address_parser_ray.state.checkpoint import Checkpointer

__all__ = ["Checkpointer"]
