"""Native (C++) fast paths: PTB tokenizer and caption scorers via ctypes."""
