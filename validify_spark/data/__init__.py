from .turns_gen import (generate_conv_meta, generate_turns,
                        standard_conversation_rules,
                        standard_turns_ruleset)

__all__ = ["generate_turns", "generate_conv_meta",
           "standard_turns_ruleset", "standard_conversation_rules"]
