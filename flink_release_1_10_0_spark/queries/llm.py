# placeholder — populated incrementally
