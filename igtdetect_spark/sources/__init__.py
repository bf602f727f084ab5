"""Sources: pages tables, freki files, wordlist dimensions."""
