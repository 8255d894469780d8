"""CLI frontends mirroring the reference's rln-cli examples
(rln-cli/src/examples/{relay,stateless,multi_message_id,partial}.rs):

    python -m zerokit_tpu.cli.relay --demo
    python -m zerokit_tpu.cli.stateless --demo
    python -m zerokit_tpu.cli.multi_message_id --demo
    python -m zerokit_tpu.cli.partial --demo

Each runs interactively by default and scripted with --demo.
"""
